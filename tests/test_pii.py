"""Unit tests for PII detection/redaction (operators/pii.py)."""

from pyspark.sql import functions as F

from gdelt_extractor_spark.operators.pii import redact_pii, scan_pii


def _df(spark, *texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")


def test_scan_counts_each_kind(spark):
    rows = scan_pii(
        _df(
            spark,
            "mail me at alice.smith+x@mail.example.org today",
            "call 415-555-0199 or 415.555.0123",
            "ssn 123-45-6789 on file",
            "host 192.168.0.1 and 10.0.0.255",
            "nothing sensitive here",
        )
    ).orderBy("id").collect()
    assert [r.n_email for r in rows] == [1, 0, 0, 0, 0]
    assert [r.n_phone for r in rows] == [0, 2, 0, 0, 0]
    assert [r.n_ssn for r in rows] == [0, 0, 1, 0, 0]
    assert [r.n_ipv4 for r in rows] == [0, 0, 0, 2, 0]
    assert [r.has_pii for r in rows] == [True, True, True, True, False]


def test_ipv4_octet_range_enforced(spark):
    """999.999.999.999 and 256.x must not count; valid-octet PREFIX of
    a longer dotted run still matches (documented RE2-portability
    floor — no lookarounds in the oracle engine)."""
    rows = scan_pii(
        _df(
            spark,
            "bad 999.999.999.999 and 256.1.1.1 and 1999.2.3.4",
            "version 10.0.1.2.3 string",
            "edge 0.0.0.0 and 255.255.255.255",
            "leading-zero 01.2.3.4",
        )
    ).orderBy("id").collect()
    assert [r.n_ipv4 for r in rows] == [0, 1, 2, 0]


def test_ssn_not_double_counted_as_phone(spark):
    r = scan_pii(_df(spark, "id 123-45-6789")).collect()[0]
    assert (r.n_ssn, r.n_phone) == (1, 0)


def test_redact_replaces_with_tags(spark):
    out = redact_pii(
        _df(spark, "bob@x.io called 415-555-0199 from 10.0.0.1 re 123-45-6789")
    ).collect()[0].text
    assert out == "[EMAIL] called [PHONE] from [IPV4] re [SSN]"


def test_redact_preserves_clean_text(spark):
    clean = "no identifiers in this sentence at all"
    assert redact_pii(_df(spark, clean)).collect()[0].text == clean


def test_redact_to_new_column_keeps_original(spark):
    row = redact_pii(_df(spark, "a@b.co"), out_col="clean").collect()[0]
    assert row.text == "a@b.co" and row.clean == "[EMAIL]"


def test_scan_is_pure_projection(spark):
    """Detection must stay a single codegen projection — no shuffle,
    no Python eval — so it composes into any scan for free."""
    plan = scan_pii(_df(spark, "x")).withColumn("t2", F.lit(1))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_credit_card_grouping_and_no_luhn(spark):
    """4-4-4-(1..4) digit groupings with space/dash/no separators
    count; phone-grouped (3-3-4) and SSN shapes don't; Luhn validity
    is NOT checked (documented over-count)."""
    rows = scan_pii(
        _df(
            spark,
            "card 4111 1111 1111 1111 on file",
            "card 4111-1111-1111-111 short form",
            "raw 4111111111111111 digits",
            "phone 415-555-0199 is not a card",
            "ssn 123-45-6789 is not a card",
            "fake-but-redacted 1234 5678 9012 3456",
        )
    ).orderBy("id").collect()
    assert [r.n_credit_card for r in rows] == [1, 1, 1, 0, 0, 1]
    assert rows[3].n_phone == 1 and rows[4].n_ssn == 1


def test_redact_credit_card_tag(spark):
    out = redact_pii(_df(spark, "pay 4111 1111 1111 1111 now")).collect()[0].text
    assert out == "pay [CREDIT_CARD] now"


def test_k_anonymity_report(spark):
    from gdelt_extractor_spark.operators.pii import k_anonymity

    df = spark.createDataFrame(
        # quasi (age, zip): group sizes 3, 1, 2  → with k=3: two
        # violating groups covering 3 rows
        [(30, "94.", 1), (30, "94.", 2), (30, "94.", 3),
         (40, "10.", 4),
         (50, "60.", 5), (50, "60.", 6)],
        "age int, zip string, row_id int",
    )
    r = k_anonymity(df, ["age", "zip"], k=3).collect()[0]
    assert (r.n_rows, r.n_groups, r.min_group_size) == (6, 3, 1)
    assert (r.n_small_groups, r.n_at_risk_rows) == (2, 3)
    assert r.at_risk_frac == 0.5


def test_k_anonymity_nulls_group_together(spark):
    from gdelt_extractor_spark.operators.pii import k_anonymity

    df = spark.createDataFrame(
        [(None, 1), (None, 2), (None, 3), (1, 4)], "age int, row_id int"
    )
    r = k_anonymity(df, ["age"], k=2).collect()[0]
    assert (r.n_groups, r.n_small_groups, r.n_at_risk_rows) == (2, 1, 1)


def test_luhn_known_vectors(spark):
    from gdelt_extractor_spark.operators.pii import luhn_scan

    # published test numbers: Visa / Amex / Mastercard valid; each
    # +1 (mod 10) on the check digit must fail
    rows = [
        (1, "pay 4539578763621486 now"),      # Visa, valid
        (2, "amex 371449635398431 ok"),       # Amex 15-digit, valid
        (3, "mc 5555555555554444 end"),       # MC, valid
        (4, "bad 4539578763621487 x"),        # off-by-one
        (5, "bad 371449635398432 x"),
        (6, "short 123456789012 no"),          # 12 digits: no candidate
        (7, "two 4539578763621486 and 1234567890123 t"),
    ]
    out = {
        (r.doc_id, r.candidate): (r.luhn_ok, r.pos)
        for r in luhn_scan(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[(1, "4539578763621486")] == (True, 0)
    assert out[(2, "371449635398431")] == (True, 0)
    assert out[(3, "5555555555554444")] == (True, 0)
    assert out[(4, "4539578763621487")] == (False, 0)
    assert out[(5, "371449635398432")] == (False, 0)
    assert not any(k[0] == 6 for k in out)
    assert out[(7, "4539578763621486")] == (True, 0)
    assert out[(7, "1234567890123")][1] == 1  # second candidate, pos 1


def test_luhn_matches_python_reference(spark):
    from gdelt_extractor_spark.operators.pii import luhn_scan

    def luhn_ref(s: str) -> bool:
        total = 0
        for i, ch in enumerate(reversed(s), start=1):
            d = int(ch)
            if i % 2 == 0:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    cands = [str(1000000000000 + 97 * k) for k in range(40)]  # 13-digit
    df = spark.createDataFrame(
        [(i, f"x {c} y") for i, c in enumerate(cands)],
        "doc_id long, text string",
    )
    got = {r.candidate: r.luhn_ok for r in luhn_scan(df).collect()}
    assert got == {c: luhn_ref(c) for c in cands}
