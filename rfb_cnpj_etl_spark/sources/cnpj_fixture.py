"""Deterministic CNPJ-format CSV fixture for the end-to-end driver query.

The driver's oracle (DuckDB) must read the exact same bytes the Spark
query reads, so this module writes a small, fully deterministic set of
CNPJ-shaped files (``;``-delimited, headerless, positional columns from
``schema.CNPJ_SCHEMAS`` — the reference's file format,
``utils/db_batch_producer.py:52-57``) to a fixed path, idempotently.

ASCII-only on purpose: DuckDB 1.0's ``read_csv`` has no encoding option,
and ASCII is the latin-1 ∩ UTF-8 common subset, so both engines parse
identical text. Real latin-1 bytes (accents, cp1252 edge cases) are
covered by the golden pytest fixtures in ``tests/test_cnpj_csv.py``.

The rows exercise every cleaning path the reference applies to this
format: date sentinels ``'0' '' ' ' '00000000'`` and the invalid
``'20230230'`` (db_transformers.py:78-84), BR decimals
(``'1.234,56'``), whitespace padding (T1 sanitize), comma-packed
secondary CNAEs with stray spaces and empties (T7 explode), multi-file
parts of one table (Q9 union), and missing-parent joins.
"""

from __future__ import annotations

import os

FIXTURE_DIR = "/tmp/rfb_cnpj_fixture_v1"

N_ESTAB = 120
N_EMPRESA = 40
#: estabelecimento i belongs to basico i % N_BASICO; basicos ≥ N_EMPRESA
#: have no empresa row (left-join NULL path).
N_BASICO = 50


def _basico(i: int) -> str:
    return f"{10000000 + i % N_BASICO:08d}"


def _estab_row(i: int) -> list[str]:
    if i % 7 == 0:
        situacao = "0"
    elif i % 11 == 0:
        situacao = "00000000"
    elif i % 13 == 0:
        situacao = ""
    elif i % 17 == 0:
        situacao = "20230230"  # invalid Feb 30 → NULL
    elif i % 19 == 0:
        situacao = " "
    else:
        situacao = f"202001{i % 28 + 1:02d}"
    inicio = f"1990{i % 9 + 1:02d}15" if i % 3 else "00000000"
    if i % 4 == 0:
        sec = ""
    else:
        codes = [f"{1000 + (i * 7 + j) % 500:04d}" for j in range(i % 3 + 1)]
        sec = " , ".join(codes) + ("," if i % 5 == 0 else "")
    return [
        _basico(i),
        f"{i // N_BASICO + 1:04d}",          # cnpj_ordem
        f"{i % 97:02d}",                      # cnpj_dv
        "1" if i % 3 == 0 else "2",           # cod_matriz_filial
        f"  LOJA {i}  ",                      # nome_fantasia (padding)
        "02" if i % 2 else "08",              # cod_situacao_cadastral
        situacao,                             # data_situacao_cadastral
        f"{i % 5:02d}",                       # cod_motivo_situacao
        "",                                   # nome_cidade_exterior
        "0" if i % 5 == 0 else f"{i % 4:03d}",  # cod_pais ('0' → M4 case)
        inicio,                               # data_inicio_atividade
        f"{6200 + i % 90:04d}",               # cod_cnae_principal
        sec,                                  # cod_cnae_secundario (packed)
        "RUA",                                # tipo_logradouro
        f"DAS FLORES {i % 30}",               # logradouro
        str(i % 999),                         # numero
        "",                                   # complemento
        f"BAIRRO {i % 12}",                   # bairro
        f"{50000000 + i:08d}",                # cep
        ["PE", "SP", "RJ", "MG"][i % 4],      # uf
        f"{2600 + i % 100:04d}",              # cod_municipio
        "81", f"9{i % 10000000:07d}",         # ddd_1, telefone_1
        "", "",                               # ddd_2, telefone_2
        "", "",                               # ddd_fax, fax
        f"c{i}@example.com ",                 # email (trailing space)
        "",                                   # situacao_especial
        "",                                   # data_situacao_especial
    ]


def _empresa_row(i: int) -> list[str]:
    return [
        f"{10000000 + i:08d}",                # cnpj_basico
        f"  EMPRESA {i} LTDA ",               # razao_social (padding)
        "2062",                               # cod_natureza_juridica
        "49",                                 # cod_qualificacao_responsavel
        "" if i % 10 == 0 else f"{i + 1}.{i % 900 + 100:03d},{i % 100:02d}",
        "01" if i % 2 else "",                # cod_porte
        "",                                   # ente_federativo
    ]


def ensure_cnpj_fixture(base_dir: str = FIXTURE_DIR) -> list[str]:
    """Write the fixture files; return their paths. Content is a pure
    function of the row index, so concurrent/repeated calls converge to
    identical bytes (write-to-temp + rename). A file is rewritten when
    its on-disk bytes differ from the generator's current output —
    otherwise editing the generator would silently keep serving stale
    fixture bytes from a previous run."""
    os.makedirs(base_dir, exist_ok=True)
    half = N_ESTAB // 2
    files = {
        "Estabelecimentos0.csv": [_estab_row(i) for i in range(half)],
        "Estabelecimentos1.csv": [_estab_row(i) for i in range(half, N_ESTAB)],
        "Empresas0.csv": [_empresa_row(i) for i in range(N_EMPRESA)],
    }
    out = []
    for name, rows in files.items():
        path = os.path.join(base_dir, name)
        out.append(path)
        content = "".join(";".join(r) + "\n" for r in rows)
        if os.path.exists(path):
            with open(path, encoding="ascii") as f:
                if f.read() == content:
                    continue
        tmp = path + ".part"
        with open(tmp, "w", encoding="ascii", newline="\n") as f:
            f.write(content)
        os.replace(tmp, path)
    return out
