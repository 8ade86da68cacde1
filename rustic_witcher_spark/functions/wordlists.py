"""Shared constants for the deterministic fake generators.

Single source of truth used by BOTH the Spark expression builders
(``fake.py``) and the DuckDB SQL renderers (``fake_sql.py``) so the
oracle comparison can never drift. All lists have power-of-two-ish
sizes; selection is ``hash_slice % len``.

The generator *contract* mirrors the reference's T4/T5 semantics
(ref: rustic-transformator/src/transformator.rs:74-119): deterministic
per (RNG_SEED, input value), stable across runs/partitions/cluster
sizes, format-valid output. Byte-equality with the Rust `fake` crate is
not a goal (SURVEY §7.3) — the wordlists here define OUR fake universe.
"""

from __future__ import annotations

DEFAULT_SEED = 42  # ref: RNG_SEED default (anonymization_dataframe_operator.rs:442-447)

# Marker substituted for NULL inside the hash so NULL cells still get a
# deterministic fake when retain_if_empty is false. (The reference gives
# NULLs a *non*-deterministic fake, transformator.rs:101-104; we choose
# deterministic so results are reproducible and oracle-checkable.)
NULL_MARKER = "\x01"

FIRST_NAMES = [
    "Alice", "Bruno", "Clara", "David", "Elena", "Felix", "Grace", "Hugo",
    "Irene", "Jonas", "Karen", "Liam", "Maria", "Noah", "Olivia", "Pablo",
    "Quinn", "Rosa", "Simon", "Tara", "Uri", "Vera", "Walter", "Xenia",
    "Yann", "Zoe", "Adam", "Bella", "Carl", "Dora", "Emil", "Faye",
]

LAST_NAMES = [
    "Anderson", "Brown", "Carter", "Diaz", "Evans", "Fischer", "Garcia", "Hansen",
    "Ivanov", "Johnson", "Keller", "Lopez", "Miller", "Nguyen", "Olsen", "Peters",
    "Quintero", "Rossi", "Schmidt", "Taylor", "Ueda", "Vargas", "Weber", "Xu",
    "Young", "Zhang", "Abbott", "Becker", "Costa", "Dunn", "Eriksen", "Fleming",
]

COMPANY_SUFFIXES = ["LLC", "Inc", "Group", "Labs", "Ltd", "Corp", "Partners", "Holdings"]

EMAIL_DOMAINS = ["example.com", "example.org", "example.net", "mail.test"]

STREETS = [
    "Main St", "Oak Ave", "Pine Rd", "Maple Dr", "Cedar Ln", "Elm St", "Lake Rd", "Hill Ave",
    "Park Blvd", "River Rd", "Sunset Dr", "Forest Ln", "Bay St", "Mill Rd", "Church St", "King Ave",
]

CITIES = [
    "Springfield", "Riverton", "Lakeside", "Fairview", "Georgetown", "Madison", "Clinton", "Arlington",
    "Salem", "Bristol", "Dover", "Hudson", "Milton", "Newport", "Oxford", "Winchester",
]
