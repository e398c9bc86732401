"""Property-based tests (hypothesis) for the pure-Python reliability
primitives — fast, no Spark session needed."""

from hypothesis import given, settings
from hypothesis import strategies as st

from oracle_cassandra_migrator_spark.reliability.retry import retry


@settings(max_examples=50, deadline=None)
@given(
    retries=st.integers(min_value=1, max_value=8),
    delay=st.floats(min_value=0.0, max_value=10.0, allow_nan=False),
    backoff=st.floats(min_value=1.0, max_value=4.0, allow_nan=False),
    fail_times=st.integers(min_value=0, max_value=10),
)
def test_retry_attempt_and_backoff_invariants(retries, delay, backoff,
                                              fail_times):
    """For any config: total attempts = min(fail_times + 1, retries);
    success iff fail_times < retries; sleeps follow delay * backoff^i."""
    waits = []
    calls = {"n": 0}

    @retry(retries=retries, delay=delay, backoff=backoff,
           sleep=waits.append)
    def sometimes():
        calls["n"] += 1
        if calls["n"] <= fail_times:
            raise IOError("boom")
        return "ok"

    if fail_times < retries:
        assert sometimes() == "ok"
        assert calls["n"] == fail_times + 1
        assert len(waits) == fail_times
    else:
        try:
            sometimes()
            raised = False
        except IOError:
            raised = True
        assert raised
        assert calls["n"] == retries
        assert len(waits) == retries - 1
    for i, w in enumerate(waits):
        assert abs(w - delay * backoff ** i) < 1e-6 * max(1.0, delay)


@settings(max_examples=5, deadline=None)
@given(
    strings=st.lists(
        st.text(
            # printable-ish, excluding surrogates; length() in Spark
            # counts codepoints like Python len()
            alphabet=st.characters(blacklist_categories=("Cs",),
                                   min_codepoint=32),
            min_size=0, max_size=30),
        min_size=1, max_size=20),
    keep=st.integers(1, 6),
)
def test_spark_mask_matches_python_reference(spark, strings, keep):
    """The Spark masking expression agrees with the obvious Python
    reference on arbitrary unicode inputs (one Spark job per example,
    batched over the generated list)."""
    from oracle_cassandra_migrator_spark.operators.masking import (
        mask_keep_last_expr,
    )

    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)],
                               "id INT, s STRING")
    got = {r.id: r.m for r in df.selectExpr(
        "id", f"{mask_keep_last_expr('s', keep)} AS m").collect()}
    for i, s in enumerate(strings):
        expected = s if len(s) <= keep else "*" * (len(s) - keep) + s[-keep:]
        assert got[i] == expected, (s, keep)
