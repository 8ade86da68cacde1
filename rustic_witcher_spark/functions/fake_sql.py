"""DuckDB-SQL renderers for the deterministic fake generators.

Each function mirrors its twin in ``fake.py`` EXACTLY (same wordlists,
same salts, same hash slices) and returns a SQL expression string in
DuckDB dialect over a given value expression. These power the
``oracle_sql()`` driver contract: the oracle re-derives the fake values
independently and hash-compares. ``tests/test_fake_oracle.py`` asserts
Spark-vs-DuckDB equality for every generator.
"""

from __future__ import annotations

from rustic_witcher_spark.functions.hashing import sql_hash_slice, sql_md5_hex
from rustic_witcher_spark.functions.wordlists import (
    CITIES,
    COMPANY_SUFFIXES,
    EMAIL_DOMAINS,
    FIRST_NAMES,
    LAST_NAMES,
    STREETS,
)

_DIGITS = "0123456789"
_ROTATIONS = [_DIGITS[k:] + _DIGITS[:k] for k in range(1, 10)]


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in words) + "]"


def _sql_pick(words: list[str], idx_expr: str) -> str:
    # DuckDB list indexing is 1-based, same as Spark element_at
    return f"({_sql_list(words)})[({idx_expr}) % {len(words)} + 1]"


def sql_fake_firstname(v: str, seed: int) -> str:
    h = sql_md5_hex(v, seed, "firstname")
    return _sql_pick(FIRST_NAMES, sql_hash_slice(h, 1))


def sql_fake_lastname(v: str, seed: int) -> str:
    h = sql_md5_hex(v, seed, "lastname")
    return _sql_pick(LAST_NAMES, sql_hash_slice(h, 1))


def sql_fake_name(v: str, seed: int) -> str:
    h = sql_md5_hex(v, seed, "name")
    return f"({_sql_pick(FIRST_NAMES, sql_hash_slice(h, 1))} || ' ' || {_sql_pick(LAST_NAMES, sql_hash_slice(h, 9))})"


def sql_fake_companyname(v: str, seed: int) -> str:
    h = sql_md5_hex(v, seed, "company")
    return f"({_sql_pick(LAST_NAMES, sql_hash_slice(h, 1))} || ' ' || {_sql_pick(COMPANY_SUFFIXES, sql_hash_slice(h, 9))})"


def sql_fake_email(v: str, seed: int) -> str:
    h = sql_md5_hex(v, seed, "email")
    return (
        f"(lower({_sql_pick(FIRST_NAMES, sql_hash_slice(h, 1))}) || '.' || "
        f"lower({_sql_pick(LAST_NAMES, sql_hash_slice(h, 9))}) || "
        f"(({sql_hash_slice(h, 17)}) % 1000)::VARCHAR || '@' || "
        f"{_sql_pick(EMAIL_DOMAINS, sql_hash_slice(h, 25))})"
    )


def sql_fake_address(v: str, seed: int) -> str:
    h = sql_md5_hex(v, seed, "address")
    return (
        f"((({sql_hash_slice(h, 1)}) % 9900 + 100)::VARCHAR || ' ' || "
        f"{_sql_pick(STREETS, sql_hash_slice(h, 9))} || ' ' || "
        f"lpad((({sql_hash_slice(h, 17)}) % 100000)::VARCHAR, 5, '0') || ' ' || "
        f"{_sql_pick(CITIES, sql_hash_slice(h, 25))})"
    )


def sql_fake_md5(v: str, seed: int) -> str:
    h = sql_md5_hex(v, seed, "md5")
    return (
        f"(substr({h}, 1, 8) || '-' || substr({h}, 9, 4) || '-4' || substr({h}, 14, 3) || '-' || "
        f"{_sql_pick(['8', '9', 'a', 'b'], sql_hash_slice(h, 25))} || substr({h}, 18, 3) || '-' || "
        f"substr({h}, 21, 12))"
    )


def sql_fake_phone(v: str, seed: int) -> str:
    k = f"(({sql_hash_slice(sql_md5_hex(v, seed, 'phone'), 1)}) % {len(_ROTATIONS)})"
    branches = " ".join(f"WHEN {i} THEN translate({v}, '{_DIGITS}', '{rot}')" for i, rot in enumerate(_ROTATIONS))
    return f"(CASE WHEN length({v}) <= 1 THEN {v} ELSE (CASE {k} {branches} END) END)"


def sql_fake_multi_email(v: str, seed: int) -> str:
    inner = f"regexp_replace(regexp_replace({v}, '^\\{{', ''), '\\}}$', '')"
    elem_fake = sql_fake_email("trim(x)", seed)
    return (
        f"(CASE WHEN length({v}) <= 1 THEN {v} ELSE "
        f"('{{' || array_to_string(list_transform(string_split({inner}, ','), x -> {elem_fake}), ',') || '}}') END)"
    )


def sql_fake_email_with_id_prefix(v: str, id_expr: str, seed: int) -> str:
    return f"(({id_expr})::VARCHAR || '-' || {sql_fake_email(v, seed)})"
