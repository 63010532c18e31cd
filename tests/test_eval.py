"""Threshold calibration + pairwise-F1 harness tests."""

import pyarrow as pa
import pytest

import ray.data as rd

from rel_ray.config import DEFAULT_CONFIG
from rel_ray.pipelines.eval import fit_threshold, pairwise_f1
from rel_ray.pipelines.linkage import run_linkage


@pytest.fixture(scope="module")
def linkage(ray_session, tiny_corpus):
    tr = rd.from_arrow(tiny_corpus["transcripts"])
    out = run_linkage(tr, DEFAULT_CONFIG, num_partitions=2)
    return {
        "records": out["records"],
        "edges": out["edges"].materialize(),
        "clusters": out["clusters"].materialize(),
    }


def test_fit_threshold_with_rep_mapping(linkage, tiny_corpus):
    labels = rd.from_arrow(tiny_corpus["labels"])
    fit = fit_threshold(linkage["edges"], labels, linkage["records"],
                        split="calib")
    # a sane calibration: high F1 on calib, threshold inside the sweep range
    assert fit["f1"] > 0.95, fit
    assert 0.2 <= fit["threshold"] <= 0.9
    # the shipped default threshold must be compatible with the calibrated one
    assert abs(fit["threshold"] - DEFAULT_CONFIG.threshold) < 0.35


def test_pairwise_f1_splits_differ(linkage, tiny_corpus):
    labels = rd.from_arrow(tiny_corpus["labels"])
    test = pairwise_f1(linkage["clusters"], labels, split="test",
                       num_partitions=2)
    calib = pairwise_f1(linkage["clusters"], labels, split="calib",
                        num_partitions=2)
    assert test["n_pairs"] > 0 and calib["n_pairs"] > 0
    assert test["n_pairs"] != calib["n_pairs"]
    assert test["f1"] >= 0.99


@pytest.mark.usefixtures("ray_session")
def test_blocking_metrics():
    import pyarrow as pa
    import ray.data as rd

    from rel_ray.pipelines.eval import blocking_metrics

    # 5 records -> C(5,2)=10 possible pairs; 4 candidates; 3 labeled true
    # pairs of which 2 survive blocking (one reversed to test canon)
    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array(["r1", "r4", "r2", "r3"]),
        "id_b": pa.array(["r2", "r1", "r3", "r5"])}))
    labels = rd.from_arrow(pa.table({
        "id_a": pa.array(["r2", "r2", "r4", "r1"]),
        "id_b": pa.array(["r1", "r3", "r5", "r3"]),
        "same_entity": pa.array([True, True, True, False]),
        "split": pa.array(["test", "test", "test", "test"])}))
    out = blocking_metrics(pairs, labels, n_records=5).to_pylist()[0]
    assert out["n_candidate_pairs"] == 4
    assert out["n_true_pairs"] == 3
    assert out["true_pairs_found"] == 2
    assert abs(out["pair_completeness"] - 2 / 3) < 1e-12
    assert abs(out["reduction_ratio"] - 0.6) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_train_pair_weights():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rel_ray.pipelines.eval import train_pair_weights

    rng = np.random.default_rng(9)
    n = 2000
    y = rng.random(n) < 0.5
    # separable-ish: positives have higher sims + noise
    base = np.where(y, 0.8, 0.2)
    feats = {c: pa.array(np.clip(base + rng.normal(0, 0.1, n), 0, 1))
             for c in ("sim_jaccard", "sim_jw", "sim_emb")}
    ds = rd.from_arrow(pa.table({**feats,
                                 "same_entity": pa.array(y)})).repartition(4)
    res = train_pair_weights(ds, epochs=30)
    assert res["accuracy"] > 0.97
    # loss strictly improves over training (full-batch GD on convex loss)
    assert res["loss_curve"][-1] < res["loss_curve"][0] * 0.5
    assert all(v > 0 for v in res["weights"].values())


class TestRocAuc:
    @staticmethod
    def _naive(scores, labels):
        pos = [s for s, l in zip(scores, labels) if l]
        neg = [s for s, l in zip(scores, labels) if not l]
        num2 = sum(2 if p > q else (1 if p == q else 0)
                   for p in pos for q in neg)
        den = len(pos) * len(neg)
        return num2, (num2 * 10**9 + den) // (2 * den) if den else None

    def _run(self, scores, labels):
        import pyarrow as pa
        import ray.data as rd

        from rel_ray.pipelines.eval import roc_auc
        ds = rd.from_arrow(pa.table({
            "s": pa.array(scores, type=pa.int64()),
            "l": pa.array(labels, type=pa.bool_())}))
        t = roc_auc(ds, score_col="s", label_col="l")
        return (t.column("auc_num2")[0].as_py(),
                t.column("auc_e9")[0].as_py(),
                t.column("n_pos")[0].as_py(), t.column("n_neg")[0].as_py())

    def test_matches_naive_with_ties(self, ray_session):
        import numpy as np
        rng = np.random.RandomState(5)
        scores = [int(x) for x in rng.randint(0, 20, size=500)]  # many ties
        labels = [bool(x) for x in rng.rand(500) < 0.3]
        num2, e9, n_pos, n_neg = self._run(scores, labels)
        exp_num2, exp_e9 = self._naive(scores, labels)
        assert (num2, e9) == (exp_num2, exp_e9)
        assert n_pos == sum(labels) and n_neg == 500 - sum(labels)

    def test_perfect_and_random(self, ray_session):
        # perfectly separated -> AUC 1.0
        _, e9, _, _ = self._run([1, 2, 3, 10, 11, 12],
                                [False, False, False, True, True, True])
        assert e9 == 10**9
        # all scores identical -> AUC 0.5 exactly
        _, e9, _, _ = self._run([7] * 10, [True] * 4 + [False] * 6)
        assert e9 == 5 * 10**8

    def test_single_class_undefined(self, ray_session):
        _, e9, n_pos, n_neg = self._run([1, 2, 3], [True, True, True])
        assert e9 is None and n_pos == 3 and n_neg == 0


class TestAveragePrecision:
    @staticmethod
    def _naive(scores, labels):
        # threshold-level AP with per-term e9 quantization, pure python
        from collections import Counter
        np_c, nn_c = Counter(), Counter()
        for s, l in zip(scores, labels):
            (np_c if l else nn_c)[s] += 1
        num, cum_tp, cum_n = 0, 0, 0
        for s in sorted(set(scores), reverse=True):
            p, q = np_c[s], nn_c[s]
            cum_tp += p
            cum_n += p + q
            num += p * ((cum_tp * 10**9) // cum_n)
        n_pos = sum(labels)
        return (num + n_pos // 2) // n_pos if n_pos else None

    def _run(self, scores, labels):
        from rel_ray.pipelines.eval import average_precision
        ds = rd.from_arrow(pa.table({
            "s": pa.array(scores, type=pa.int64()),
            "l": pa.array(labels, type=pa.bool_())}))
        t = average_precision(ds, score_col="s", label_col="l")
        return t.column("ap_e9")[0].as_py()

    def test_matches_naive_with_ties(self, ray_session):
        import numpy as np
        rng = np.random.RandomState(11)
        scores = [int(x) for x in rng.randint(0, 15, size=400)]
        labels = [bool(x) for x in rng.rand(400) < 0.25]
        assert self._run(scores, labels) == self._naive(scores, labels)

    def test_perfect_ranking_is_one(self, ray_session):
        ap = self._run([5, 6, 7, 1, 2, 3],
                       [True, True, True, False, False, False])
        assert ap == 10**9

    def test_no_positives_undefined(self, ray_session):
        assert self._run([1, 2], [False, False]) is None


class TestCalibration:
    def test_out_of_range_scores_raise_loudly(self, ray_session):
        """Scores outside [0, score_max] used to fail deep inside
        bincount / as a table-length mismatch; the contract error must
        name the offending range."""
        import pytest as _pt
        from rel_ray.functions.rayutil import collect_table
        from rel_ray.pipelines.eval import calibration_bins
        schema = pa.schema([("bin", pa.int64()), ("n", pa.int64()),
                            ("n_pos", pa.int64()),
                            ("frac_pos_e9", pa.int64()),
                            ("mean_score_e9", pa.int64())])
        for bad in ([-1, 3], [3, 15]):
            ds = rd.from_arrow(pa.table({
                "s": pa.array(bad, type=pa.int64()),
                "l": pa.array([True, False])}))
            with _pt.raises(Exception, match=r"\[0, 9\]"):
                collect_table(calibration_bins(
                    ds, score_col="s", label_col="l", score_max=9,
                    num_bins=2), schema)

    def test_bins_and_ece_known_answer(self, ray_session):
        from rel_ray.functions.rayutil import collect_table
        from rel_ray.pipelines.eval import (calibration_bins,
                                            expected_calibration_error)
        # scores 0..9 with score_max=9, 2 bins of width 5
        scores = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]
        labels = [True, False, False, False, False,
                  True, True, True, True, False]
        ds = rd.from_arrow(pa.table({
            "s": pa.array(scores, type=pa.int64()),
            "l": pa.array(labels, type=pa.bool_())}))
        bins = collect_table(
            calibration_bins(ds, score_col="s", label_col="l",
                             score_max=9, num_bins=2),
            pa.schema([("bin", pa.int64()), ("n", pa.int64()),
                       ("n_pos", pa.int64()), ("frac_pos_e9", pa.int64()),
                       ("mean_score_e9", pa.int64())])
        ).sort_by([("bin", "ascending")])
        assert bins.column("n").to_pylist() == [5, 5]
        assert bins.column("n_pos").to_pylist() == [1, 4]
        assert bins.column("frac_pos_e9").to_pylist() == [
            10**9 // 5, 4 * 10**9 // 5]
        # mean score bin0 = (0+1+2+3+4)/(9*5), bin1 = (5+..+9)/(9*5)
        assert bins.column("mean_score_e9").to_pylist() == [
            10 * 10**9 // 45, 35 * 10**9 // 45]
        ece = expected_calibration_error(bins)
        exp = (5 * abs(10**9 // 5 - 10 * 10**9 // 45)
               + 5 * abs(4 * 10**9 // 5 - 35 * 10**9 // 45)) // 10
        assert ece.column("ece_e9")[0].as_py() == exp
        assert ece.column("n")[0].as_py() == 10


class TestIsotonic:
    @staticmethod
    def _naive_pav(pairs):
        """Fraction-exact PAV over (score, y) rows."""
        from collections import defaultdict
        from fractions import Fraction
        agg = defaultdict(lambda: [0, 0])
        for s, y in pairs:
            agg[s][0] += 1
            agg[s][1] += int(y)
        scores = sorted(agg)
        blocks = []  # (w, s, scores_in_block)
        for sc in scores:
            w, s = agg[sc]
            blocks.append([w, s, [sc]])
            while (len(blocks) >= 2 and
                   Fraction(blocks[-2][1], blocks[-2][0])
                   >= Fraction(blocks[-1][1], blocks[-1][0])):
                a = blocks.pop()
                blocks[-1][0] += a[0]
                blocks[-1][1] += a[1]
                blocks[-1][2] += a[2]
        out = {}
        for w, s, scs in blocks:
            for sc in scs:
                out[sc] = (s * 10**9) // w
        return out

    def _run(self, pairs):
        from rel_ray.pipelines.eval import isotonic_fit
        ds = rd.from_arrow(pa.table({
            "s": pa.array([p[0] for p in pairs], type=pa.int64()),
            "l": pa.array([p[1] for p in pairs], type=pa.bool_())}))
        t = isotonic_fit(ds, score_col="s", label_col="l")
        return dict(zip(t.column("score").to_pylist(),
                        t.column("fitted_e9").to_pylist()))

    def test_matches_naive_pav(self, ray_session):
        import numpy as np
        rng = np.random.RandomState(23)
        # noisy monotone signal: violations guaranteed
        pairs = [(int(s), bool(rng.rand() < 0.1 + 0.08 * s))
                 for s in rng.randint(0, 12, size=600)]
        got = self._run(pairs)
        assert got == self._naive_pav(pairs)
        # monotone non-decreasing in score
        fitted = [got[s] for s in sorted(got)]
        assert all(a <= b for a, b in zip(fitted, fitted[1:]))

    def test_all_violating_pools_to_global_mean(self, ray_session):
        # decreasing observed rates -> one pooled block = global mean
        pairs = ([(0, True)] * 3 + [(0, False)] * 1 +
                 [(1, True)] * 1 + [(1, False)] * 3)
        got = self._run(pairs)
        assert got[0] == got[1] == 4 * 10**9 // 8

    def test_perfect_monotone_untouched(self, ray_session):
        pairs = ([(0, False)] * 4 + [(1, True), (1, False)] * 2 +
                 [(2, True)] * 4)
        got = self._run(pairs)
        assert got == {0: 0, 1: 5 * 10**8, 2: 10**9}


class TestFsExplain:
    def test_waterfall_sums_and_monotone(self, ray_session):
        import numpy as np
        from rel_ray.pipelines.eval import fs_explain_pairs
        rng = np.random.RandomState(7)
        n = 400
        is_match = rng.rand(n) < 0.25
        def feat(base):
            return np.clip(np.where(is_match,
                                    base + rng.rand(n) * 0.2,
                                    rng.rand(n) * 0.5), 0, 1)
        t = pa.table({
            "id_a": pa.array([f"a{i}" for i in range(n)]),
            "id_b": pa.array([f"b{i}" for i in range(n)]),
            "sim_jaccard": pa.array(feat(0.8)),
            "sim_jw": pa.array(feat(0.75)),
            "sim_emb": pa.array(feat(0.85))})
        out = fs_explain_pairs(rd.from_arrow(t)).to_pandas()
        # waterfall property: total == prior + sum of per-feature weights
        parts = (out["prior_e6"] + out["sim_jaccard_weight_e6"]
                 + out["sim_jw_weight_e6"] + out["sim_emb_weight_e6"])
        assert (out["total_e6"] == parts).all()
        # posterior is monotone in total weight
        s = out.sort_values("total_e6")
        assert s["posterior_e6"].is_monotonic_increasing
        # high-agreement pairs explain as matches, low as non-matches
        hi = out[is_match]["posterior_e6"].mean()
        lo = out[~is_match]["posterior_e6"].mean()
        assert hi > 0.9e6 and lo < 0.5e6


class TestBlockingFrontier:
    def test_counts_and_recall(self, ray_session):
        from rel_ray.pipelines.eval import blocking_rule_frontier
        recs = rd.from_arrow(pa.table({
            "record_id": pa.array(["r1", "r2", "r3", "r4"]),
            "mention_norm": pa.array(["anna b", "anna c", "bob x",
                                      "bella y"])}))
        labels = rd.from_arrow(pa.table({
            "id_a": pa.array(["r1", "r3"]),
            "id_b": pa.array(["r2", "r4"]),
            "same_entity": pa.array([True, True])}))
        out = blocking_rule_frontier(
            recs, labels,
            rules={"first_char": lambda c: pa.compute.utf8_slice_codeunits(
                c, 0, 1),
                "first_token": lambda c: pa.compute.list_element(
                    pa.compute.split_pattern(c, " "), 0)}).to_pandas() \
            .set_index("rule")
        # first_char: keys a,a,b,b -> cand 1+1=2; covers r1-r2 (a==a),
        # covers r3-r4 (b==b) -> recall 1.0
        assert out.loc["first_char", "cand_pairs"] == 2
        assert out.loc["first_char", "covered"] == 2
        assert out.loc["first_char", "recall_e6"] == 10**6
        # first_token: anna,anna,bob,bella -> cand 1; covers only r1-r2
        assert out.loc["first_token", "cand_pairs"] == 1
        assert out.loc["first_token", "covered"] == 1
        assert out.loc["first_token", "recall_e6"] == 5 * 10**5
