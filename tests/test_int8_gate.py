"""int8 production gating (VERDICT r4 #3): the recorded per-checkpoint
``int8_default`` verdict (gates.json, tools/validate_checkpoints.py) routes
W8A8 trunks into the production CLIs via islx.cli.gated_int8_params — the
same gated()-style lookup the hand-scale flip uses. The reference has no
quantization at all (src/body.py:58-65 runs f32)."""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _clear_env(monkeypatch):
    for k in ("ISLX_INT8", "ISLX_WEIGHTS_DIR"):
        monkeypatch.delenv(k, raising=False)


# ---------------------------------------------------------------------------
# int8_gated: the verdict lookup
# ---------------------------------------------------------------------------

def test_int8_gated_go(monkeypatch, tmp_path):
    _clear_env(monkeypatch)
    (tmp_path / "gates.json").write_text(json.dumps({"int8_default": "GO"}))
    from islx.core.config import int8_gated

    go, note = int8_gated(str(tmp_path))
    assert go and "GO" in note


def test_int8_gated_no_go(monkeypatch, tmp_path):
    _clear_env(monkeypatch)
    (tmp_path / "gates.json").write_text(
        json.dumps({"int8_default": "NO-GO"}))
    from islx.core.config import int8_gated

    go, note = int8_gated(str(tmp_path))
    assert not go and "NO-GO" in note


def test_int8_gated_absent(monkeypatch, tmp_path):
    _clear_env(monkeypatch)
    from islx.core.config import int8_gated

    go, note = int8_gated(str(tmp_path))      # no gates.json
    assert not go and "gates.json" in note


def test_int8_env_force_off_beats_go(monkeypatch, tmp_path):
    _clear_env(monkeypatch)
    (tmp_path / "gates.json").write_text(json.dumps({"int8_default": "GO"}))
    monkeypatch.setenv("ISLX_INT8", "0")
    from islx.core.config import int8_gated

    go, note = int8_gated(str(tmp_path))
    assert not go and "env" in note


def test_int8_env_force_on_without_gate(monkeypatch, tmp_path):
    _clear_env(monkeypatch)
    monkeypatch.setenv("ISLX_INT8", "1")
    from islx.core.config import int8_gated

    go, note = int8_gated(str(tmp_path))
    assert go and "env" in note


# ---------------------------------------------------------------------------
# gated_int8_params: the CLI routing (quantization itself is stubbed — the
# int8 numerics have their own golden gate, tests/test_golden_weights.py)
# ---------------------------------------------------------------------------

def _stub_quantizer(calls):
    def stub(params, model_type, xcals):
        calls.append((model_type, tuple(np.shape(x) for x in xcals)))
        return {"stub": {"w_q": np.full((1,), len(calls), np.int8),
                         "model": np.frombuffer(
                             model_type.encode().ljust(8), np.uint8).copy()}}
    return stub


def _weights_dir(tmp_path, verdict="GO"):
    (tmp_path / "gates.json").write_text(
        json.dumps({"int8_default": verdict}))
    w = tmp_path / "hand.npz"
    w.write_bytes(b"x" * 16)
    return str(w)


def test_gated_int8_applies_on_go(monkeypatch, tmp_path):
    _clear_env(monkeypatch)
    from islx.models import quant

    calls = []
    monkeypatch.setattr(quant, "quantize_model", _stub_quantizer(calls))
    from islx.cli import gated_int8_params

    hand_w = _weights_dir(tmp_path)
    img = (np.random.RandomState(0).rand(96, 72, 3) * 255).astype(np.uint8)
    notes = []
    bp, hp, applied = gated_int8_params(
        {"b": np.zeros(1)}, {"h": np.zeros(1)}, hand_weights=hand_w,
        calib_image=img, log=notes.append)
    assert applied
    assert [c[0] for c in calls] == ["body25", "hand"]
    assert "w_q" in bp["stub"] and "w_q" in hp["stub"]
    assert any("GO" in n for n in notes)
    # cache written next to the checkpoint
    assert os.path.exists(tmp_path / ".int8_cache" / "meta.json")


def test_gated_int8_cache_hit_skips_recalibration(monkeypatch, tmp_path):
    _clear_env(monkeypatch)
    from islx.models import quant

    calls = []
    monkeypatch.setattr(quant, "quantize_model", _stub_quantizer(calls))
    from islx.cli import gated_int8_params

    hand_w = _weights_dir(tmp_path)
    img = (np.random.RandomState(0).rand(96, 72, 3) * 255).astype(np.uint8)
    args = dict(hand_weights=hand_w, calib_image=img)
    gated_int8_params({"b": np.zeros(1)}, {"h": np.zeros(1)}, **args)
    n_first = len(calls)
    bp, hp, applied = gated_int8_params(
        {"b": np.zeros(1)}, {"h": np.zeros(1)}, **args)
    assert applied and len(calls) == n_first      # loaded, not recalibrated
    assert "w_q" in bp["stub"]


def test_gated_int8_no_go_stays_float(monkeypatch, tmp_path):
    _clear_env(monkeypatch)
    from islx.models import quant

    calls = []
    monkeypatch.setattr(quant, "quantize_model", _stub_quantizer(calls))
    from islx.cli import gated_int8_params

    hand_w = _weights_dir(tmp_path, verdict="NO-GO")
    img = np.zeros((64, 64, 3), np.uint8)
    bp0, hp0 = {"b": np.zeros(1)}, {"h": np.zeros(1)}
    bp, hp, applied = gated_int8_params(bp0, hp0, hand_weights=hand_w,
                                        calib_image=img)
    assert not applied and not calls and bp is bp0 and hp is hp0


def test_gated_int8_no_weights_borrows_nothing(monkeypatch, tmp_path):
    """ADVICE r4 pattern: without --hand-weights the params are random init
    — a GO recorded for some other checkpoint must not quantize them."""
    _clear_env(monkeypatch)
    monkeypatch.setenv("ISLX_WEIGHTS_DIR", str(tmp_path))
    (tmp_path / "gates.json").write_text(json.dumps({"int8_default": "GO"}))
    from islx.models import quant

    calls = []
    monkeypatch.setattr(quant, "quantize_model", _stub_quantizer(calls))
    from islx.cli import gated_int8_params

    notes = []
    bp, hp, applied = gated_int8_params(
        {"b": np.zeros(1)}, {"h": np.zeros(1)},
        calib_image=np.zeros((64, 64, 3), np.uint8), log=notes.append)
    assert not applied and not calls
    assert any("no --hand-weights" in n for n in notes)


def test_gated_int8_env_off_beats_go(monkeypatch, tmp_path):
    _clear_env(monkeypatch)
    monkeypatch.setenv("ISLX_INT8", "0")
    from islx.models import quant

    calls = []
    monkeypatch.setattr(quant, "quantize_model", _stub_quantizer(calls))
    from islx.cli import gated_int8_params

    hand_w = _weights_dir(tmp_path)
    _, _, applied = gated_int8_params(
        {"b": np.zeros(1)}, {"h": np.zeros(1)}, hand_weights=hand_w,
        calib_image=np.zeros((64, 64, 3), np.uint8))
    assert not applied and not calls


def test_gated_int8_changed_checkpoint_recalibrates(monkeypatch, tmp_path):
    """The cache is keyed by the weight file's identity: replacing the
    checkpoint under the same path recalibrates instead of serving stale
    scales."""
    _clear_env(monkeypatch)
    from islx.models import quant

    calls = []
    monkeypatch.setattr(quant, "quantize_model", _stub_quantizer(calls))
    from islx.cli import gated_int8_params

    hand_w = _weights_dir(tmp_path)
    img = np.zeros((64, 64, 3), np.uint8)
    gated_int8_params({"b": np.zeros(1)}, {"h": np.zeros(1)},
                      hand_weights=hand_w, calib_image=img)
    n_first = len(calls)
    with open(hand_w, "wb") as f:                 # new size -> new identity
        f.write(b"y" * 32)
    _, _, applied = gated_int8_params({"b": np.zeros(1)},
                                      {"h": np.zeros(1)},
                                      hand_weights=hand_w, calib_image=img)
    assert applied and len(calls) == n_first + 2


def test_serve_gate_defaults_int8_after(monkeypatch, tmp_path):
    """serve: a recorded GO defaults --int8-after (live-traffic calibration)
    without requiring the operator to know the flag."""
    _clear_env(monkeypatch)
    (tmp_path / "gates.json").write_text(json.dumps({"int8_default": "GO"}))
    from islx.core.config import int8_gated

    go, _ = int8_gated(str(tmp_path))
    assert go   # the CLI sets args.int8_after = 256 on this verdict
