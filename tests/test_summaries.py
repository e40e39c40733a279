"""Summary sink tests (SURVEY §5.1 parity: TF_SUMMARY-gated weight/
gradient/loss-distribution histograms to tf_logs/{train,val})."""

import json
import os

import jax.numpy as jnp
import numpy as np

from metrpo_tpu.utils.summaries import (SummaryWriter, make_writers,
                                        read_events)


def test_scalar_and_histogram_roundtrip(tmp_path):
    with SummaryWriter(str(tmp_path)) as w:
        w.scalar("loss", 1.5, step=3)
        w.histogram("val_losses", [0.1, 0.2, 0.3, 0.4], step=3)
    events = read_events(str(tmp_path))
    assert len(events) == 2
    sc = events[0]
    assert sc == {"step": 3, "tag": "loss", "kind": "scalar", "value": 1.5}
    hist = events[1]
    assert hist["kind"] == "histogram"
    np.testing.assert_allclose(hist["mean"], 0.25)
    assert sum(hist["hist_counts"]) == 4
    # bin edges must bracket the data
    assert hist["hist_edges"][0] <= 0.1 and hist["hist_edges"][-1] >= 0.4


def test_tree_summaries_match_numpy(tmp_path):
    rng = np.random.RandomState(0)
    tree = {"layer0": {"w": jnp.asarray(rng.randn(8, 4), jnp.float32),
                       "b": jnp.zeros(4)},
            "logstd": jnp.full((4,), -0.5)}
    with SummaryWriter(str(tmp_path)) as w:
        w.tree("policy/weights", tree, step=1)
    events = {e["tag"]: e for e in read_events(str(tmp_path))}
    assert set(events) == {"policy/weights/layer0/w",
                           "policy/weights/layer0/b",
                           "policy/weights/logstd"}
    e = events["policy/weights/layer0/w"]
    flat = np.asarray(tree["layer0"]["w"]).ravel()
    np.testing.assert_allclose(e["mean"], flat.mean(), rtol=1e-5)
    np.testing.assert_allclose(e["std"], flat.std(), rtol=1e-5)
    np.testing.assert_allclose(e["l2"], np.linalg.norm(flat), rtol=1e-5)
    assert sum(e["hist_counts"]) == flat.size
    # every line in the file is valid standalone JSON (jq/pandas-readable)
    with open(tmp_path / "events.jsonl") as f:
        for line in f:
            json.loads(line)


def test_make_writers_layout(tmp_path):
    train, val = make_writers(str(tmp_path))
    train.scalar("a", 1.0, 0)
    val.scalar("b", 2.0, 0)
    train.close(), val.close()
    assert os.path.isfile(tmp_path / "tf_logs" / "train" / "events.jsonl")
    assert os.path.isfile(tmp_path / "tf_logs" / "val" / "events.jsonl")
    assert make_writers(None) == (None, None)


def test_orchestrator_tf_summary_gate(tmp_path):
    """End-to-end: tf_summary=True streams weight + loss-distribution
    events during a real sweep (model_based_rl.py:516-538 flush points)."""
    from metrpo_tpu.config import config_from_dict
    from metrpo_tpu.envs.point2d import Point2DEnv
    from metrpo_tpu.orchestrator import Trainer
    from tests.test_e2e_point2d import POINT2D_TINY

    raw = dict(POINT2D_TINY)
    raw["tf_summary"] = True
    raw["sweep_iters"] = 1
    cfg = config_from_dict(raw)
    assert cfg.tf_summary
    trainer = Trainer(cfg, Point2DEnv(), Point2DEnv, snapshot_dir=str(tmp_path))
    trainer.train(sweep_iters=1)

    train_events = read_events(str(tmp_path / "tf_logs" / "train"))
    val_events = read_events(str(tmp_path / "tf_logs" / "val"))
    train_tags = {e["tag"] for e in train_events}
    val_tags = {e["tag"] for e in val_events}
    assert any(t.startswith("training_dynamics/weights/") for t in train_tags)
    assert any(t.startswith("training_policy/weights/") for t in train_tags)
    assert "training_policy/weight_update" in train_tags
    assert "training_dynamics/validation_losses" in val_tags
    assert "real_current_validation_cost" in val_tags
    # both sinks: TensorBoard event files exist alongside the JSONL
    import glob
    for sub in ("train", "val"):
        assert glob.glob(str(tmp_path / "tf_logs" / sub /
                             "events.out.tfevents.*")), sub
    # default-off: no tf_logs dir is created
    raw2 = dict(POINT2D_TINY)
    cfg2 = config_from_dict(raw2)
    assert not cfg2.tf_summary
