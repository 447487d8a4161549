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


def test_cli_helper_ignores_foreign_verdict_without_weights(monkeypatch,
                                                            tmp_path):
    """ADVICE r4: with no --hand-weights the pipeline runs random init
    params — a GO recorded for SOME OTHER checkpoint (e.g. the synthetic
    bundle via ISLX_WEIGHTS_DIR fallback) must not flip their config."""
    _clear_env(monkeypatch)
    monkeypatch.setenv("ISLX_WEIGHTS_DIR", str(tmp_path))
    (tmp_path / "gates.json").write_text(json.dumps(
        {"hand_160_default": "GO"}))
    from islx.cli import gated_hand_cfg

    notes = []
    cfg = gated_hand_cfg(None, log=notes.append)
    assert int(round(cfg.scale_search[0] * cfg.boxsize)) == 184
    assert notes and "no --hand-weights" in notes[0]


def test_gate_184_no_go_falls_back_to_368(monkeypatch, tmp_path):
    """VERDICT r4 weak #1: a recorded NO-GO on the production default itself
    must be honored — fall back to the reference 368px path."""
    _clear_env(monkeypatch)
    monkeypatch.setenv("ISLX_WEIGHTS_DIR", str(tmp_path))
    (tmp_path / "gates.json").write_text(json.dumps(
        {"hand_184_default": "NO-GO", "hand_160_default": "NO-GO"}))
    cfg, note = bench._gated_hand_cfg()
    assert int(round(cfg.scale_search[0] * cfg.boxsize)) == 368
    assert "NO-GO" in note and "368" in note


def test_gate_160_go_wins_over_184_no_go(monkeypatch, tmp_path):
    """A 160 GO subsumes the 184 question (smaller crops passed the bar)."""
    _clear_env(monkeypatch)
    monkeypatch.setenv("ISLX_WEIGHTS_DIR", str(tmp_path))
    (tmp_path / "gates.json").write_text(json.dumps(
        {"hand_184_default": "NO-GO", "hand_160_default": "GO"}))
    cfg, _ = bench._gated_hand_cfg()
    assert int(round(cfg.scale_search[0] * cfg.boxsize)) == 160


def test_gate_unevaluable_stays_default_with_note(monkeypatch, tmp_path):
    """When the instrument had no signal the verdict is withheld: stay on
    the default and SAY so (never silently sit on a meaningless NO-GO)."""
    _clear_env(monkeypatch)
    monkeypatch.setenv("ISLX_WEIGHTS_DIR", str(tmp_path))
    (tmp_path / "gates.json").write_text(json.dumps(
        {"hand_184_default": "UNEVALUABLE",
         "hand_160_default": "UNEVALUABLE"}))
    cfg, note = bench._gated_hand_cfg()
    assert int(round(cfg.scale_search[0] * cfg.boxsize)) == 184
    assert "UNEVALUABLE" in note


def test_gate_184_go_applies_stage_trim(monkeypatch, tmp_path):
    """ADVICE r4: the validated 184px stage trim (hand_stages) is consumed
    by gated(), not left env-only."""
    _clear_env(monkeypatch)
    monkeypatch.setenv("ISLX_WEIGHTS_DIR", str(tmp_path))
    (tmp_path / "gates.json").write_text(json.dumps(
        {"hand_184_default": "GO", "hand_160_default": "NO-GO",
         "hand_stages": 5}))
    cfg, note = bench._gated_hand_cfg()
    assert int(round(cfg.scale_search[0] * cfg.boxsize)) == 184
    assert cfg.stages == 5
    assert "s5" in note
