"""The driver-facing bench line must stay compact and parseable.

Round 4's official record (BENCH_r04.json) has parsed=null: the single
JSON line outgrew the driver's ~2,000-char stdout tail and the headline
"value" — printed at the FRONT of the line — was truncated away.  These
tests pin the new contract (bench.compose_final_line): the final stdout
line carries the scoring schema + a minimal extra and NEVER exceeds
bench.FINAL_LINE_MAX chars, even with every section maximally populated.
"""

import json

import bench


def _maximal_extras():
    """Every extras field filled with worst-case-verbose values."""
    stream = {"cameras": 4, "duration_s": 15.5, "fps_submitted": 116.123,
              "fps_processed": 45.456, "dropped": 123456, "avg_batch": 7.9,
              "p50_ms": 1201.9, "p90_ms": 3111.2, "p99_ms": 59259.5,
              "host_mbps": 20.845, "link_mbps": 18.999,
              "transport": "yuv420", "submitted": 1801, "processed": 706,
              "profile": "auto", "probe_mbps": 19.5, "final_depth": 4,
              "final_inflight": 2,
              "adapt": [[1.0, 500.0, 45.0, 2, 2]] * 12}
    return {
        "batch": 96, "max_faces": 16, "commit": "abcdef0",
        "device": "TPU v5 lite0",
        "errors": {f"section_{i}": "X" * 300 for i in range(12)},
        "hbm_mb": {f"sec_{i}": {"live_arrays_mb": 12345.6}
                   for i in range(20)},
        "fused_iter_ms": 205.406,
        "frame_latency_b1_ms": 4.057,
        "faces_per_sec_int8_embed_mode": 9144.2,
        "flops_g": {"fused": 20641.3, "detect": 2512.5, "embed": 18026.8,
                    "warp": 102.0, "scrfd_fwd": 2512.4},
        "mfu": {"fused": 0.5101, "b1": 0.2567, "int8_mode": 0.2289},
        "density_sweep": {
            k: {"faces_per_sec": 1234.5, "iter_ms": 205.4,
                "ms_per_frame": 2.14, "mfu": 0.51}
            for k in ("1", "4", "8", "16")},
        "gallery_qps": {
            "100k": {"f32": 458380.0, "bf16": 730924.4, "int8": 854666.8},
            "1m": {"f32": 45642.9, "bf16": 45325.7, "int8": 87845.6}},
        "gallery_match_call_ms": {f"{s}_{d}": 64.14
                                  for s in ("100k", "1m")
                                  for d in ("f32", "bf16", "int8")},
        "streaming": dict(stream), "streaming_yuv420": dict(stream),
        "streaming_latency": dict(stream), "streaming_auto": dict(stream),
    }


def _result(extras):
    return {"metric": "faces_per_sec_per_chip", "value": 7491.3,
            "unit": "faces/s (detect+align+embed, 640x640, bf16)",
            "vs_baseline": 1.498, "extra": extras}


def test_final_line_compact_and_parseable(monkeypatch):
    extras = _maximal_extras()
    monkeypatch.setattr(bench, "SECTION_ERRORS", extras["errors"])
    line = bench.compose_final_line(_result(extras), extras)
    assert len(line) <= bench.FINAL_LINE_MAX, len(line)
    parsed = json.loads(line)
    # the scoring schema survives verbatim
    assert parsed["metric"] == "faces_per_sec_per_chip"
    assert parsed["value"] == 7491.3
    assert parsed["vs_baseline"] == 1.498
    # the cross-round comparison numbers made it in
    ex = parsed["extra"]
    assert ex["b1_ms"] == 4.057
    assert ex["int8_faces_s"] == 9144.2
    assert ex["mfu_fused"] == 0.5101
    assert ex["gallery_qps"]["1m"]["int8"] == 87845.6
    assert ex["stream"]["profile"] == "auto"
    assert ex["density_faces_s"]["1"] == 1234.5


def test_final_line_with_empty_extras(monkeypatch):
    """A run that died before any section still prints a valid line."""
    monkeypatch.setattr(bench, "SECTION_ERRORS", {"fatal": "x" * 300})
    extras = {"commit": "deadbee", "errors": bench.SECTION_ERRORS}
    line = bench.compose_final_line(
        {"metric": "faces_per_sec_per_chip", "value": 0.0,
         "unit": "faces/s (detect+align+embed, 640x640, bf16)",
         "vs_baseline": 0.0, "extra": extras}, extras)
    assert len(line) <= bench.FINAL_LINE_MAX
    parsed = json.loads(line)
    assert parsed["value"] == 0.0
    assert parsed["extra"]["errors"] == ["fatal"]


def test_cap_enforced_under_pathological_bloat(monkeypatch):
    """Even absurd per-field sizes can't push the line over the cap."""
    extras = _maximal_extras()
    extras["gallery_qps"] = {str(i): {"f32": 1.0} for i in range(200)}
    extras["density_sweep"] = {str(i): {"faces_per_sec": 1.0}
                               for i in range(200)}
    monkeypatch.setattr(bench, "SECTION_ERRORS", extras["errors"])
    line = bench.compose_final_line(_result(extras), extras)
    assert len(line) <= bench.FINAL_LINE_MAX
    assert json.loads(line)["value"] == 7491.3


def test_emit_writes_detail_and_prints_compact_last(monkeypatch, tmp_path, capsys):
    """_emit: full detail -> BENCH_DETAIL.json + stderr, compact line ->
    stdout as the LAST line (the driver parses stdout's final line)."""
    import os

    monkeypatch.setattr(bench, "SECTION_ERRORS", {})
    extras = _maximal_extras()
    extras["errors"] = {}
    result = _result(extras)
    # redirect the detail file into tmp_path (_emit anchors it at
    # dirname(bench.__file__))
    target_dir = str(tmp_path)
    monkeypatch.setattr(bench.os.path, "dirname", lambda p: target_dir)
    bench._emit(result, extras)
    captured = capsys.readouterr()
    lines = [ln for ln in captured.out.strip().splitlines() if ln]
    final = json.loads(lines[-1])
    assert final["value"] == 7491.3
    assert len(lines[-1]) <= bench.FINAL_LINE_MAX
    detail = json.loads((tmp_path / "BENCH_DETAIL.json").read_text())
    assert detail["extra"]["gallery_match_call_ms"]  # full detail survives
    assert "# detail:" in captured.err
