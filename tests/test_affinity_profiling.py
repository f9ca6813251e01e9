"""Unit tests for association rules, mutual information, and the
Flesch readability scores — hand-computed expectations on tiny
frames, plus the edge cases the oracles can't reach (caps, empties).
"""

from __future__ import annotations

import math

from gdelt_extractor_spark.operators.affinity import association_rules
from gdelt_extractor_spark.operators.profiling import mutual_information
from gdelt_extractor_spark.operators.textstats import readability


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "basket string, item string")


BASKETS = [
    ("b1", "x"), ("b1", "y"), ("b1", "z"),
    ("b2", "x"), ("b2", "y"),
    ("b3", "x"), ("b3", "z"),
    ("b4", "y"),
]


class TestAssociationRules:
    def test_hand_computed_metrics(self, spark):
        out = {
            (r.antecedent, r.consequent): r
            for r in association_rules(
                _baskets(spark, BASKETS), "basket", "item", min_pair_count=2
            ).collect()
        }
        # N=4 baskets; x in 3, y in 3, z in 2; (x,y) in 2, (x,z) in 2
        assert set(out) == {("x", "y"), ("x", "z")}
        xy = out[("x", "y")]
        assert xy.pair_baskets == 2
        assert xy.support == 0.5
        assert xy.confidence == round(2 / 3, 6)
        assert xy.reverse_confidence == round(2 / 3, 6)
        assert xy.lift == round(2 * 4 / (3 * 3), 6)
        xz = out[("x", "z")]
        assert xz.lift == round(2 * 4 / (3 * 2), 6)  # > 1: z rides with x

    def test_basket_cap_drops_hub_baskets(self, spark):
        out = association_rules(
            _baskets(spark, BASKETS),
            "basket",
            "item",
            min_pair_count=1,
            max_basket_items=2,
        ).collect()
        # b1 (3 items) dropped entirely: pairs only from b2/b3, and the
        # marginals/N recompute over the kept baskets (N=3, x in 2)
        got = {(r.antecedent, r.consequent): r for r in out}
        assert set(got) == {("x", "y"), ("x", "z")}
        assert got[("x", "y")].pair_baskets == 1
        assert got[("x", "y")].antecedent_baskets == 2

    def test_duplicate_rows_count_once(self, spark):
        out = association_rules(
            _baskets(spark, [("b1", "x"), ("b1", "x"), ("b1", "y")] * 2),
            "basket",
            "item",
            min_pair_count=1,
        ).collect()
        assert len(out) == 1 and out[0].pair_baskets == 1

    def test_empty_input_keeps_schema(self, spark):
        out = association_rules(
            _baskets(spark, []), "basket", "item"
        )
        assert out.count() == 0
        assert "lift" in out.columns


class TestMutualInformation:
    def test_perfect_dependence(self, spark):
        rows = [(str(i % 4), str(i % 4)) for i in range(40)]
        df = spark.createDataFrame(rows, "x string, y string")
        out = mutual_information(df, "x", "y").collect()
        assert len(out) == 4
        r = out[0]
        ln4 = round(math.log(4), 6)
        assert r.mi == ln4 and r.h_x == ln4 and r.h_y == ln4
        assert r.nmi == 1.0

    def test_independence_is_zero(self, spark):
        rows = [(a, b) for a in "ab" for b in "01" for _ in range(5)]
        df = spark.createDataFrame(rows, "x string, y string")
        out = mutual_information(df, "x", "y").collect()
        assert all(r.mi == 0.0 and r.nmi == 0.0 for r in out)
        # each cell is p=1/4 with independent p=1/2 marginals
        assert all(r.p_xy == 0.25 and r.pmi == 0.0 for r in out)

    def test_single_class_zero_entropy_guard(self, spark):
        df = spark.createDataFrame(
            [("a", str(i % 3)) for i in range(9)], "x string, y string"
        )
        out = mutual_information(df, "x", "y").collect()
        assert all(r.h_x == 0.0 and r.mi == 0.0 and r.nmi == 0.0 for r in out)


class TestReadability:
    def _one(self, spark, text):
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return readability(df, "doc_id", "text").collect()[0]

    def test_known_sentence(self, spark):
        r = self._one(spark, "The cat sat.")
        assert (r.n_words, r.n_sentences, r.n_syllables) == (3, 1, 3)
        assert r.flesch_ease == round(206.835 - 1.015 * 3 - 84.6 * 1, 4)
        assert r.fk_grade == round(0.39 * 3 + 11.8 * 1 - 15.59, 4)

    def test_wordless_text_scores_null(self, spark):
        r = self._one(spark, "1234 !!!")
        assert r.n_words == 0
        assert r.flesch_ease is None and r.fk_grade is None

    def test_multi_sentence_counts(self, spark):
        r = self._one(spark, "Hi there! How are you? Fine.")
        assert r.n_sentences == 3 and r.n_words == 6

    def test_longer_words_read_harder(self, spark):
        easy = self._one(spark, "The cat sat on the mat. It was fun.")
        hard = self._one(
            spark,
            "Extraordinary bureaucratic obfuscation perpetuates "
            "unintelligible administrative terminology.",
        )
        assert easy.flesch_ease > hard.flesch_ease
        assert easy.fk_grade < hard.fk_grade


class TestAucScore:
    def _auc(self, spark, rows):
        from gdelt_extractor_spark.operators.profiling import auc_score

        df = spark.createDataFrame(rows, "score double, label boolean")
        return auc_score(df, "score", "label").collect()[0]

    def test_hand_computed(self, spark):
        r = self._auc(
            spark,
            [(0.9, True), (0.8, False), (0.7, True), (0.6, False)],
        )
        # pos-beats-neg pairs: (0.9>0.8, 0.9>0.6, 0.7>0.6) = 3 of 4
        assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 0.75)

    def test_perfect_and_inverted(self, spark):
        perfect = [(float(s), s >= 5) for s in range(10)]
        assert self._auc(spark, perfect).auc == 1.0
        inverted = [(float(s), s < 5) for s in range(10)]
        assert self._auc(spark, inverted).auc == 0.0

    def test_all_ties_is_half(self, spark):
        r = self._auc(spark, [(1.0, True)] * 3 + [(1.0, False)] * 5)
        assert r.auc == 0.5 and r.n_scores == 1

    def test_single_class_is_null(self, spark):
        assert self._auc(spark, [(1.0, True), (2.0, True)]).auc is None

    def test_matches_naive_reference(self, spark):
        import random

        rng = random.Random(11)
        rows = [
            (float(rng.randint(0, 20)) / 4, rng.random() < 0.4)
            for _ in range(300)
        ]
        pos = [s for s, l in rows if l]
        neg = [s for s, l in rows if not l]
        wins = sum(1 for p in pos for q in neg if p > q)
        ties = sum(1 for p in pos for q in neg if p == q)
        want = round((wins + 0.5 * ties) / (len(pos) * len(neg)), 6)
        assert self._auc(spark, rows).auc == want


class TestLDiversity:
    def test_homogeneous_group_flagged(self, spark):
        from gdelt_extractor_spark.operators.pii import l_diversity

        rows = (
            [("g1", "a")] * 4                       # 1 distinct → at risk
            + [("g2", "a"), ("g2", "b"), ("g2", "c")]  # 3 distinct → safe
            + [("g3", "a"), ("g3", "b")]            # 2 distinct → at risk
        )
        df = spark.createDataFrame(rows, "quasi string, sens string")
        r = l_diversity(df, ["quasi"], "sens", l=3).collect()[0]
        assert (r.n_rows, r.n_groups, r.min_diversity) == (9, 3, 1)
        assert (r.n_low_groups, r.n_at_risk_rows) == (2, 6)
        assert r.at_risk_frac == round(6 / 9, 6)

    def test_null_sensitive_not_a_value(self, spark):
        from gdelt_extractor_spark.operators.pii import l_diversity

        df = spark.createDataFrame(
            [("g", "a"), ("g", None), ("g", None)], "quasi string, sens string"
        )
        r = l_diversity(df, ["quasi"], "sens", l=2).collect()[0]
        assert r.min_diversity == 1 and r.n_low_groups == 1


class TestChiSquare:
    def _chi(self, spark, rows):
        from gdelt_extractor_spark.operators.profiling import chi_square

        df = spark.createDataFrame(rows, "x string, y string")
        return chi_square(df, "x", "y").collect()[0]

    def test_hand_computed_2x2(self, spark):
        rows = (
            [("a", "0")] * 10 + [("a", "1")] * 20
            + [("b", "0")] * 30 + [("b", "1")] * 40
        )
        obs = {("a", "0"): 10, ("a", "1"): 20, ("b", "0"): 30, ("b", "1"): 40}
        nx = {"a": 30, "b": 70}
        ny = {"0": 40, "1": 60}
        want = sum(
            (o - nx[x] * ny[y] / 100) ** 2 / (nx[x] * ny[y] / 100)
            for (x, y), o in obs.items()
        )
        r = self._chi(spark, rows)
        assert (r.n, r.dof) == (100, 1)
        assert r.chi2 == round(want, 6)
        assert r.cramers_v == round((want / 100) ** 0.5, 6)

    def test_independence_is_zero(self, spark):
        rows = [(a, b) for a in "ab" for b in "01" for _ in range(5)]
        r = self._chi(spark, rows)
        assert r.chi2 == 0.0 and r.cramers_v == 0.0

    def test_missing_cells_counted_in_closed_form(self, spark):
        # ("b","1") never observed: its expected mass must still enter
        rows = [("a", "0")] * 5 + [("a", "1")] * 5 + [("b", "0")] * 10
        obs = {("a", "0"): 5, ("a", "1"): 5, ("b", "0"): 10, ("b", "1"): 0}
        nx = {"a": 10, "b": 10}
        ny = {"0": 15, "1": 5}
        want = sum(
            (o - nx[x] * ny[y] / 20) ** 2 / (nx[x] * ny[y] / 20)
            for (x, y), o in obs.items()
        )
        r = self._chi(spark, rows)
        assert r.chi2 == round(want, 6)

    def test_perfect_association_v_is_one(self, spark):
        rows = [("a", "0")] * 7 + [("b", "1")] * 13
        assert self._chi(spark, rows).cramers_v == 1.0


class TestQuantileNormalize:
    def test_groups_share_distribution_after(self, spark):
        from gdelt_extractor_spark.operators.features import quantile_normalize

        # group g2 = g1 shifted by +100: same shape, different location
        rows = [(i, "g1", float(i)) for i in range(40)] + [
            (100 + i, "g2", float(i) + 100.0) for i in range(40)
        ]
        df = spark.createDataFrame(rows, "rid long, grp string, v double")
        out = quantile_normalize(df, "grp", "v", "rid", n_q=8).collect()
        by_grp = {}
        for r in out:
            by_grp.setdefault(r.grp, {})[r.bucket] = r.normalized
        # identical normalized value per bucket in both groups
        assert by_grp["g1"] == by_grp["g2"]
        # reference = mean of the two group means per bucket
        assert by_grp["g1"][1] == round((2.0 + 102.0) / 2, 6)

    def test_deterministic_under_ties(self, spark):
        from gdelt_extractor_spark.operators.features import quantile_normalize

        rows = [(i, "g", 1.0) for i in range(10)]  # all values tie
        df = spark.createDataFrame(rows, "rid long, grp string, v double")
        a = sorted(map(tuple, quantile_normalize(df, "grp", "v", "rid", 4).collect()))
        b = sorted(
            map(
                tuple,
                quantile_normalize(
                    df.repartition(7), "grp", "v", "rid", 4
                ).collect(),
            )
        )
        assert a == b


class TestTargetEncode:
    def test_loo_hand_case(self, spark):
        from gdelt_extractor_spark.operators.features import target_encode

        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0)]
        df = spark.createDataFrame(rows, "cat string, y double")
        out = {
            (r.cat, r.y): r.encoded
            for r in target_encode(df, "cat", "y").collect()
        }
        assert out[("a", 1.0)] == round((2 + 3) / 2, 6)
        assert out[("a", 3.0)] == round((1 + 2) / 2, 6)
        # singleton with no smoothing: falls back to the global prior
        assert out[("b", 10.0)] == round((1 + 2 + 3 + 10) / 4, 6)

    def test_smoothing_shrinks_toward_prior(self, spark):
        from gdelt_extractor_spark.operators.features import target_encode

        rows = [("a", 0.0)] * 3 + [("b", 100.0)] * 3
        df = spark.createDataFrame(rows, "cat string, y double")
        prior = 50.0
        out = {
            r.cat: r.encoded
            for r in target_encode(df, "cat", "y", smoothing=4.0).collect()
        }
        # enc(a) = (0 - 0 + 4*50) / (3 - 1 + 4) = 200/6
        assert out["a"] == round(4 * prior / 6, 6)
        assert out["b"] == round((200.0 + 4 * prior) / 6, 6)

    def test_non_loo_is_plain_smoothed_mean(self, spark):
        from gdelt_extractor_spark.operators.features import target_encode

        rows = [("a", 1.0), ("a", 3.0)]
        df = spark.createDataFrame(rows, "cat string, y double")
        out = target_encode(df, "cat", "y", loo=False).collect()
        assert all(r.encoded == 2.0 for r in out)


class TestBenfordAudit:
    def test_conformant_data_low_mad(self, spark):
        from gdelt_extractor_spark.operators.profiling import benford_audit

        # 10^u for uniform u is exactly Benford-distributed
        rows = [(10 ** (i / 9973.0),) for i in range(9973)]
        df = spark.createDataFrame(rows, "v double")
        out = benford_audit(df, "v").collect()
        assert len(out) == 9
        assert {r.digit for r in out} == set(range(1, 10))
        assert out[0].mad < 0.002
        # obs_frac rounds to 6 decimals per digit → ≤ 4.5e-6 total slack
        assert abs(sum(r.obs_frac for r in out) - 1.0) < 5e-6

    def test_uniform_data_flagged(self, spark):
        from gdelt_extractor_spark.operators.profiling import benford_audit

        # first digits uniform: MAD far above the 0.015 threshold
        rows = [(float(d) + 0.5, ) for d in range(1, 10) for _ in range(50)]
        df = spark.createDataFrame(rows, "v double")
        out = benford_audit(df, "v").collect()
        assert out[0].mad > 0.015
        assert all(abs(r.obs_frac - round(1 / 9, 6)) < 1e-3 for r in out)

    def test_zero_and_null_excluded(self, spark):
        from gdelt_extractor_spark.operators.profiling import benford_audit

        df = spark.createDataFrame(
            [(0.0,), (None,), (123.0,), (-20.5,)], "v double"
        )
        out = {r.digit: r.n for r in benford_audit(df, "v").collect()}
        assert out[1] == 1 and out[2] == 1 and sum(out.values()) == 2


class TestPrCurve:
    def _pr(self, spark, rows):
        from gdelt_extractor_spark.operators.profiling import pr_curve

        df = spark.createDataFrame(rows, "score double, label boolean")
        return {
            r.score: (r.tp, r.fp, r.fn, r.precision, r.recall, r.f1)
            for r in pr_curve(df, "score", "label").collect()
        }

    def test_hand_computed_points(self, spark):
        out = self._pr(
            spark,
            [(0.9, True), (0.8, False), (0.7, True), (0.6, False)],
        )
        # threshold 0.9: tp=1 fp=0 → P=1, R=0.5
        assert out[0.9] == (1, 0, 1, 1.0, 0.5, round(2 / 3, 6))
        # threshold 0.7: tp=2 fp=1 → P=2/3, R=1
        assert out[0.7] == (2, 1, 0, round(2 / 3, 6), 1.0, 0.8)
        # threshold 0.6: everything positive
        assert out[0.6] == (2, 2, 0, 0.5, 1.0, round(2 * 0.5 / 1.5, 6))

    def test_recall_monotone_and_ties_merge(self, spark):
        rows = [(1.0, True), (1.0, False), (0.5, True)]
        out = self._pr(spark, rows)
        assert set(out) == {1.0, 0.5}  # one point per DISTINCT score
        assert out[1.0][0] == 1 and out[0.5][0] == 2
        assert out[1.0][4] <= out[0.5][4]  # recall non-decreasing

    def test_no_positives_gives_null_recall_f1(self, spark):
        out = self._pr(spark, [(1.0, False), (0.5, False)])
        assert all(v[4] is None and v[5] is None for v in out.values())
