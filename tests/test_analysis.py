"""Tests for the offline analysis tooling."""

import numpy as np

from link_prediction_analysis import analyze, bucketize, metrics
from greedy_classifier import construct_ref_data, greedy_rank, tier1_ranks


class TestBucketAnalysis:
    def test_metrics(self):
        m = metrics([1, 2, 4])
        assert m["n"] == 3
        np.testing.assert_allclose(m["mrr"], (1 + 0.5 + 0.25) / 3)

    def test_bucketize(self):
        edges = [0, 1, 3]
        assert bucketize(0, edges) == "<=0"
        assert bucketize(2, edges) == "<=3"
        assert bucketize(9, edges) == ">3"

    def test_analyze_shapes(self):
        train_q = np.array([[0, 0, 1, 0], [0, 0, 1, 1], [2, 1, 3, 1]], np.int64)
        preds = [(0, 0, 1, 2, "tail", 1), (0, 0, 1, 2, "head", 5),
                 (2, 1, 3, 2, "tail", 10)]
        rep, raw, by_time = analyze(preds, train_q, window=5)
        assert rep["overall"]["all"]["n"] == 3
        # (0,0,1) repeats in the window -> 'repeated' bucket populated
        assert rep["triple_repetition"]["repeated"]["n"] >= 2
        # regression fits present whenever >=2 distinct frequencies exist
        for dim, fits in rep["regression_fits"].items():
            assert {"slope", "intercept", "r2"} <= set(fits["mrr"])
        assert rep["per_time"]["2"]["n"] == 3
        assert set(raw) == {"query_pair_freq", "target_ent_freq", "rel_freq"}

    def test_write_figures(self, tmp_path):
        train_q = np.array([[0, 0, 1, 0], [0, 0, 1, 1], [2, 1, 3, 1],
                            [2, 1, 3, 0], [4, 0, 5, 1]], np.int64)
        preds = [(0, 0, 1, 2, "tail", 1), (0, 0, 1, 2, "head", 5),
                 (2, 1, 3, 2, "tail", 10), (4, 0, 5, 2, "tail", 2)]
        from link_prediction_analysis import write_figures
        _, raw, by_time = analyze(preds, train_q, window=5)
        write_figures(raw, by_time, str(tmp_path))
        import os
        assert (tmp_path / "mrr_per_time.png").exists()
        assert any(f.endswith("_hit_10.png") for f in os.listdir(tmp_path))


class TestAggregatedAnalysis:
    def test_cli_two_models(self, tmp_path, capsys, monkeypatch):
        # regression: analyze() returning (report, raw, by_time) broke the
        # cross-model CLI, which consumed the old report-only return
        import pickle
        import sys
        a = [(0, 0, 1, 2, "tail", 1), (2, 1, 3, 2, "tail", 10)]
        b = [(0, 0, 1, 2, "tail", 3), (2, 1, 3, 2, "tail", 2)]
        pa, pb = tmp_path / "a.pkl", tmp_path / "b.pkl"
        pa.write_bytes(pickle.dumps(a))
        pb.write_bytes(pickle.dumps(b))
        import aggregated_analysis
        monkeypatch.setattr(sys, "argv", [
            "aggregated_analysis.py", f"ma={pa}", f"mb={pb}"])
        aggregated_analysis.main()
        out = capsys.readouterr().out
        assert "overall" in out
        assert "win rate" in out
        assert "regression_fits" not in out  # non-bucket keys skipped


class TestGreedyClassifier:
    def test_recency_tiering(self):
        train = [(0, 0, 1, 5), (0, 0, 2, 3), (0, 0, 3, 1)]
        tabs = construct_ref_data(train)
        sub_rel_to_ob = tabs[0]
        # at t=6 the most recent (s,r) object comes first
        ranks = tier1_ranks(sub_rel_to_ob[(0, 0)], 6, window=10, future=False,
                            vote="recency", lam=0.1)
        assert ranks[0] == 1 and ranks[1] == 2 and ranks[2] == 3

    def test_greedy_rank_finds_target(self):
        train = [(0, 0, 1, 5), (0, 0, 2, 3)]
        tabs = construct_ref_data(train)
        r = greedy_rank(tabs[0][(0, 0)], tabs[2][0], tabs[4][0], 6, 1,
                        list(range(10)), 10, False, "recency", 0.1)
        assert r == 0  # most recent co-occurring object ranks first

    def test_frequency_vote(self):
        train = [(0, 0, 1, 5), (0, 0, 2, 5), (0, 0, 2, 4)]
        tabs = construct_ref_data(train)
        ranks = tier1_ranks(tabs[0][(0, 0)], 6, window=10, future=False,
                            vote="frequency", lam=0.1)
        assert ranks[0] == 2  # appears twice -> higher decayed frequency
