"""Structured metrics forwarding: stage timers and the training loop emit
JSONL records when ANURAXLA_METRICS_FILE is set; no-op (and cheap) when not
(the wandb-shaped hook the reference pins but never wires — SURVEY.md §5.5)."""

import json

import numpy as np

from anuraxla.utils.metrics import get_metrics, reset_metrics_sink
from anuraxla.utils.timing import stage_timer


def _read_jsonl(path):
    return [json.loads(line) for line in path.read_text().splitlines()]


def test_default_sink_is_noop(monkeypatch):
    monkeypatch.delenv("ANURAXLA_METRICS_FILE", raising=False)
    monkeypatch.delenv("ANURAXLA_WANDB", raising=False)
    reset_metrics_sink()
    assert get_metrics().enabled is False
    with stage_timer("noop-stage", n_items=3, log=None):
        pass  # must not raise or write anything


def test_stage_timer_forwards_records(tmp_path, monkeypatch):
    out = tmp_path / "metrics.jsonl"
    monkeypatch.setenv("ANURAXLA_METRICS_FILE", str(out))
    reset_metrics_sink()
    try:
        with stage_timer("encode[test]", n_items=10, log=None):
            pass
        with stage_timer("fit", log=None):
            pass
        recs = _read_jsonl(out)
        assert len(recs) == 2
        assert recs[0]["kind"] == "stage" and recs[0]["stage"] == "encode[test]"
        assert recs[0]["n_items"] == 10 and "rate" in recs[0] and "ts" in recs[0]
        assert "n_items" not in recs[1]
    finally:
        reset_metrics_sink()


def test_train_loop_forwards_metrics(tmp_path, monkeypatch, rng):
    out = tmp_path / "train.jsonl"
    monkeypatch.setenv("ANURAXLA_METRICS_FILE", str(out))
    reset_metrics_sink()
    try:
        from anuraxla.models.train import TrainConfig, train_loop
        from anuraxla.models.vae import VAEConfig

        vcfg = VAEConfig(latent_dim=8, widths=(8,), dense_width=16, groups=4,
                         input_hw=(16, 16))
        tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=3, beta=0.1, seed=0)
        batches = iter([rng.standard_normal((2, 16, 16, 1)).astype(np.float32)] * 3)
        train_loop(vcfg, tc, batches, num_steps=3, log_every=1, log_fn=lambda *a: None)
        recs = [r for r in _read_jsonl(out) if r["kind"] == "train"]
        assert len(recs) == 3
        assert {"loss", "recon", "kl", "step"} <= set(recs[0])
        assert recs[1]["step"] == 1
    finally:
        reset_metrics_sink()
