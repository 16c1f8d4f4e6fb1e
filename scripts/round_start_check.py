"""Round-start orientation: run FIRST thing each round.

    python scripts/round_start_check.py

Prints the three facts that decide where the round's effort goes —
each has cost a round of signal when missed before:

1. testdata schema drift (round 3: timestamps silently became
   TIMESTAMP_NTZ and one cast crashed both gates);
2. whether the previous round's bench line parsed (rounds 2-3 both
   recorded `parsed: null` for different reasons);
3. which registry queries still lack a green CORRECTNESS row across
   ALL rounds, and whether they sit inside the driver's 50-row window.
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
TESTDATA = "/root/testdata/sf0.01"

#: (table, column) -> type string observed in round 4; drift is not an
#: error, it is the FIRST thing to know about.
EXPECTED_TYPES = {
    ("events", "ts"): "timestamp[us]",
    ("orders", "o_orderdate"): "timestamp[us]",
    ("lineitem", "l_shipdate"): "timestamp[us]",
    ("embeddings", "embedding"): "list<element: float>",
    ("documents", "text"): "string",
}


def check_schemas() -> None:
    print("== testdata schema drift ==")
    drift = False
    for (table, col), expected in EXPECTED_TYPES.items():
        try:
            schema = pq.read_schema(f"{TESTDATA}/{table}.parquet")
            actual = str(schema.field(col).type)
        except Exception as exc:  # noqa: BLE001
            print(f"  {table}.{col}: UNREADABLE ({exc})")
            drift = True
            continue
        if actual != expected:
            print(f"  {table}.{col}: {expected} -> {actual}   <-- DRIFT")
            drift = True
    print("  (no drift)" if not drift else
          "  ^ audit every cast/expression touching these columns")


def check_bench() -> None:
    print("== bench history ==")
    for f in sorted(REPO.glob("BENCH_r*.json")):
        d = json.loads(f.read_text())
        parsed = d.get("parsed")
        status = "OK" if parsed else "PARSE FAILED"
        val = (parsed or {}).get("value")
        print(f"  {f.name}: {status}" + (f" value={val}" if val else ""))


def check_registry() -> None:
    print("== registry window vs green union ==")
    from library_data_warehouse_and_business_analytics_system_spark.plans import QUERIES

    green: set[str] = set()
    errored: set[str] = set()
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(f.read_text()).items():
            if row.get("hash_match") and row.get("rows_match") \
                    and row.get("schema_match"):
                green.add(name)
            else:
                errored.add(name)
    names = list(QUERIES)
    window = set(names[:50])
    never = [n for n in names if n not in green]
    red = sorted(errored - green)
    print(f"  registry={len(names)}  union-green={len(green & set(names))}"
          f"  never-green={len(never)}  errored-latest={len(red)}")
    for n in never:
        where = "IN window" if n in window else "TAIL — rotate it in!"
        print(f"    never-green: {n}  ({where})")
    for n in red:
        print(f"    errored in some round (check latest file): {n}")


if __name__ == "__main__":
    check_schemas()
    check_bench()
    check_registry()
