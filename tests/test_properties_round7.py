"""Property-based differentials for the round-7 operators: random
inputs, exact equivalence against an independent reference
(full recompute / pure-Python implementation).

Spark-backed hypothesis tests keep example counts small — each
example runs real Spark jobs; the value is the adversarial SHAPE
search (duplicated extremes, empty groups, one-char words), not raw
example volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.operators.bpe import (
    bpe_train, word_freqs,
)
from library_data_warehouse_and_business_analytics_system_spark.operators.incremental_agg import (
    build_minmax_aggregate, refresh_minmax_aggregate,
)
from library_data_warehouse_and_business_analytics_system_spark.sources.txlog import (
    tx_merge_parts, tx_read, tx_read_parts, tx_write_parts,
)
from tests.test_bpe import _ref_train

_SETTINGS = dict(max_examples=8, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


# --- MIN/MAX refresh ≡ recompute under random merge sequences ------------

_rows = st.lists(
    st.tuples(st.integers(0, 11),                 # key
              st.sampled_from([2019, 2020]),      # partition
              st.integers(0, 3),                  # group
              st.integers(-5, 5)),                # value (dup-heavy domain)
    min_size=1, max_size=8,
    unique_by=lambda r: r[0])


@given(seed=_rows, merges=st.lists(_rows, min_size=1, max_size=3))
@settings(**_SETTINGS)
def test_minmax_refresh_equals_recompute_random(spark, tmp_path_factory,
                                                seed, merges):
    tmp = tmp_path_factory.mktemp("mmprop")
    t, agg = str(tmp / "fact"), str(tmp / "agg")

    def df(rows):
        return spark.createDataFrame(
            rows, "k long, part int, grp long, v long")

    tx_write_parts(df(seed), t, "part", mode="overwrite")
    v = build_minmax_aggregate(spark, t, agg, ["grp"], ["v"])
    for m in merges:
        tx_merge_parts(spark, t, df(m), keys=["k"], part_col="part")
        v, _ = refresh_minmax_aggregate(spark, t, agg, ["grp"], ["v"], v)
        got = {(r.grp, r.min_v, r.max_v, r.n_rows)
               for r in tx_read(spark, agg).collect()}
        want = {(r.grp, r.m, r.x, r.n) for r in
                tx_read_parts(spark, t).groupBy("grp")
                .agg(F.min("v").alias("m"), F.max("v").alias("x"),
                     F.count(F.lit(1)).alias("n")).collect()}
        assert got == want


# --- distributed BPE ≡ pure-Python reference on random corpora ----------

_word = st.text(alphabet="abc", min_size=1, max_size=5)


@given(words=st.lists(_word, min_size=1, max_size=12),
       n_merges=st.integers(1, 6))
@settings(**_SETTINGS)
def test_bpe_matches_reference_random(spark, tmp_path_factory, words,
                                      n_merges):
    docs = spark.createDataFrame([(" ".join(words),)], "text string")
    wf = word_freqs(docs).localCheckpoint(eager=True)
    word_freq = {r["word"]: r["freq"] for r in wf.collect()}
    want_merges, want_vocab = _ref_train(word_freq, n_merges)
    got_merges, vocab_df = bpe_train(wf, n_merges)
    assert got_merges == want_merges
    assert {r["symbol"]: r["freq"]
            for r in vocab_df.collect()} == want_vocab
