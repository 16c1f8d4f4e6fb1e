"""Build the committed PII-scrub fixture (fixtures/pii_docs.parquet).

Deterministic, seeded: word-salad sentences (alpha-only vocabulary, so
no accidental phone/IP matches) with 0-3 synthetic PII spans injected
per document — emails, IPv4s, SSN-shaped ids, phone numbers in the
555-01xx fictional range. Run once and commit the parquet; the
`pii_scrub_stats` gate query and its DuckDB oracle both read this file,
so both engines see byte-identical input (the library_gate pattern).

    python scripts/build_pii_fixture.py
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from library_data_warehouse_and_business_analytics_system_spark.session import get_spark

OUT = Path(__file__).resolve().parent.parent / "fixtures" / "pii_docs.parquet"

WORDS = ("ledger batch scan merge spark window sort table row value key "
         "hash part fast slow line query plan agg join filter shuffle "
         "broadcast bucket salt spill codegen arrow column schema").split()


def make_pii(rng: random.Random) -> str:
    kind = rng.randrange(4)
    if kind == 0:
        return (f"user{rng.randrange(100)}.{rng.choice(WORDS)}"
                f"@{rng.choice(['mail', 'corp', 'example'])}."
                f"{rng.choice(['com', 'org', 'net', 'co.uk'])}")
    if kind == 1:
        return ".".join(str(rng.randrange(256)) for _ in range(4))
    if kind == 2:
        return (f"{rng.randrange(100, 999)}-{rng.randrange(10, 99)}"
                f"-{rng.randrange(1000, 9999)}")
    return (f"+{rng.randrange(1, 99)} ({rng.randrange(200, 989)}) "
            f"555-{rng.randrange(100, 199):04d}")


def main() -> None:
    rng = random.Random(20260814)
    rows = []
    for doc_id in range(300):
        n_words = rng.randrange(8, 25)
        tokens = [rng.choice(WORDS) for _ in range(n_words)]
        n_pii = rng.choice((0, 0, 1, 1, 2, 3))
        # PII spans are placed between alpha words, never adjacent to
        # each other or to digits, so the span boundaries are
        # unambiguous under every pattern.
        positions = sorted(rng.sample(range(1, n_words), n_pii))
        for off, pos in enumerate(positions):
            tokens.insert(pos + off, make_pii(rng))
        rows.append((doc_id, " ".join(tokens)))

    spark = get_spark("pii-fixture")
    (spark.createDataFrame(rows, "doc_id long, text string")
     .coalesce(1).write.mode("overwrite").parquet(str(OUT)))
    print(f"wrote {OUT} ({len(rows)} docs)")


if __name__ == "__main__":
    main()
