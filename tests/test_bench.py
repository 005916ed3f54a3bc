"""Hermetic tests for bench.py's quality-gated headline selection.

The driver records bench.py's single JSON line as the round's headline, so
the selection logic must be provably correct without a TPU: the fast
(checkerboard+fix) tier becomes the headline ONLY when its measured PSNR
passes BASELINE.md's 40 dB fidelity gate, and the exact path is always
reported alongside.
"""

import json

import bench


def test_gate_pass_promotes_fast_tier():
    r = bench.result_line("tpu", 100967.0, dt=0.02991, cb_dt=0.02621, cb_psnr=41.0)
    assert r["shade_rate"] == "checkerboard+fix"
    assert r["value"] == round(1.0 / 0.02621, 2)
    assert r["frame_ms"] == 26.21
    assert r["exact_path_fps"] == round(1.0 / 0.02991, 2)
    assert r["vs_baseline"] == round((1.0 / 0.02621) / bench.TARGET_FPS, 3)
    assert r["checkerboard_fix_psnr_db"] == 41.0
    json.dumps(r)  # all values JSON-serializable


def test_gate_fail_falls_back_to_exact_path():
    r = bench.result_line("tpu", 100967.0, dt=0.02991, cb_dt=0.02621, cb_psnr=39.9)
    assert r["shade_rate"] == "full"
    assert r["value"] == round(1.0 / 0.02991, 2)
    assert r["frame_ms"] == 29.91
    # the fast tier's numbers are still reported for the record
    assert r["checkerboard_fix_frame_ms"] == 26.21
    assert r["vs_baseline"] == round((1.0 / 0.02991) / bench.TARGET_FPS, 3)


def test_mtris_follows_headline_mode():
    fast = bench.result_line("tpu", 1e5, dt=0.030, cb_dt=0.025, cb_psnr=45.0)
    slow = bench.result_line("tpu", 1e5, dt=0.030, cb_dt=0.025, cb_psnr=10.0)
    assert fast["mtris_per_sec"] == round(1e5 * (1.0 / 0.025) / 1e6, 1)
    assert slow["mtris_per_sec"] == round(1e5 * (1.0 / 0.030) / 1e6, 1)
