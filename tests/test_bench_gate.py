"""bench.py flagship-config gating: the 160px hand-crop flip is driven by
the gates.json verdict that tools/validate_checkpoints.py writes next to the
evaluated checkpoints (PARITY.md #7) — never hardcoded, env always wins."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _clear_env(monkeypatch):
    for k in ("ISLX_HAND_SCALE", "ISLX_HAND_STAGES", "ISLX_WEIGHTS_DIR"):
        monkeypatch.delenv(k, raising=False)


def test_default_is_184_without_gates(monkeypatch, tmp_path):
    _clear_env(monkeypatch)
    monkeypatch.setenv("ISLX_WEIGHTS_DIR", str(tmp_path))  # no gates.json
    cfg, note = bench._gated_hand_cfg()
    assert int(round(cfg.scale_search[0] * cfg.boxsize)) == 184
    assert cfg.stages == 6
    assert "gates.json" in note


def test_gate_go_flips_to_160(monkeypatch, tmp_path):
    _clear_env(monkeypatch)
    monkeypatch.setenv("ISLX_WEIGHTS_DIR", str(tmp_path))
    (tmp_path / "gates.json").write_text(json.dumps(
        {"hand_160_default": "GO", "hand_160_stages": 5}))
    cfg, note = bench._gated_hand_cfg()
    assert int(round(cfg.scale_search[0] * cfg.boxsize)) == 160
    assert cfg.stages == 5
    assert "GO" in note


def test_gate_no_go_stays_184(monkeypatch, tmp_path):
    _clear_env(monkeypatch)
    monkeypatch.setenv("ISLX_WEIGHTS_DIR", str(tmp_path))
    (tmp_path / "gates.json").write_text(json.dumps(
        {"hand_160_default": "NO-GO"}))
    cfg, _ = bench._gated_hand_cfg()
    assert int(round(cfg.scale_search[0] * cfg.boxsize)) == 184
    assert cfg.stages == 6


def test_env_override_beats_gate(monkeypatch, tmp_path):
    _clear_env(monkeypatch)
    monkeypatch.setenv("ISLX_WEIGHTS_DIR", str(tmp_path))
    (tmp_path / "gates.json").write_text(json.dumps(
        {"hand_160_default": "GO", "hand_160_stages": 5}))
    monkeypatch.setenv("ISLX_HAND_SCALE", "1.0")
    cfg, note = bench._gated_hand_cfg()
    assert int(round(cfg.scale_search[0] * cfg.boxsize)) == 368
    assert note == "env override"


def test_corrupt_gates_json_falls_back(monkeypatch, tmp_path):
    _clear_env(monkeypatch)
    monkeypatch.setenv("ISLX_WEIGHTS_DIR", str(tmp_path))
    (tmp_path / "gates.json").write_text("{not json")
    cfg, _ = bench._gated_hand_cfg()
    assert int(round(cfg.scale_search[0] * cfg.boxsize)) == 184


def test_handconfig_gated_is_the_library_surface(monkeypatch, tmp_path):
    """The gate logic lives in HandConfig.gated (islx/core/config.py) so
    production CLIs resolve the same recorded verdict as bench.py."""
    _clear_env(monkeypatch)
    (tmp_path / "gates.json").write_text(json.dumps(
        {"hand_160_default": "GO", "hand_160_stages": 6}))
    from islx.core.config import HandConfig

    cfg, note = HandConfig.gated(str(tmp_path))
    assert int(round(cfg.scale_search[0] * cfg.boxsize)) == 160
    assert cfg.stages == 6
    assert "GO" in note


def test_cli_helper_reads_gates_next_to_weights(monkeypatch, tmp_path):
    """islx.cli.gated_hand_cfg: the verdict travels with the checkpoint —
    gates.json sits in the --hand-weights directory."""
    _clear_env(monkeypatch)
    (tmp_path / "gates.json").write_text(json.dumps(
        {"hand_160_default": "GO"}))
    w = tmp_path / "hand.npz"
    w.write_bytes(b"")
    from islx.cli import gated_hand_cfg

    notes = []
    cfg = gated_hand_cfg(str(w), log=notes.append)
    assert int(round(cfg.scale_search[0] * cfg.boxsize)) == 160
    assert notes and "GO" in notes[0]


def test_cli_helper_default_without_weights(monkeypatch, tmp_path):
    _clear_env(monkeypatch)
    monkeypatch.setenv("ISLX_WEIGHTS_DIR", str(tmp_path))  # no gates.json
    from islx.cli import gated_hand_cfg

    cfg = gated_hand_cfg(None)
    assert int(round(cfg.scale_search[0] * cfg.boxsize)) == 184
