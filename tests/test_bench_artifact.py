"""The driver-parseable bench contract: the LAST stdout line of bench.py
must be self-contained JSON that fits the driver's ~2,000-char tail
capture (round-5 failure mode: one 4.5 KB line truncated to an
unparseable fragment, emptying the round's official perf record)."""

from __future__ import annotations

import json

import bench

_HEADLINE = {name: 1.234 for name in bench.HEADLINE}
_HEADLINE["crawl_e2e"] = 50.274


def _full_artifact(scaling) -> dict:
    return {
        "metric": ("crawl frontier URLs fetched+deduped per second "
                   "(32x625-car synthetic world)"),
        "value": 1097.37,
        "unit": "urls/sec",
        "queries": _HEADLINE,
        "sf": 0.1,
        "cores": 32,
        "detail": {
            "crawl_urls_fetched": 40000, "crawl_urls_discovered": 20000,
            "crawl_cars_saved": 17130, "crawl_images_verified_ok": 17130,
            "crawl_waves": 8, "crawl_runs_s": [55.602, 50.274],
            "crawl_fetched_deduped_per_sec": 1097.37,
            "crawl_fetched_deduped_per_sec_mean": 1041.9,
            **{f"rows_{n}": 12345 for n in bench.HEADLINE},
        },
        "canary": {"jvm_latency_s_pre": 0.204, "jvm_latency_s_post": 0.081,
                   "recipe": "x" * 300},
        "crawl_profile_s": {f"sec_{i}": 1.0 for i in range(30)},
        "scaling": scaling,
    }


def test_compact_line_fits_capture_window_and_parses():
    scaling = {"phase": "summary", "scaling_efficiency": 0.881,
               "attempts": [{"scaling_efficiency": 0.757,
                             "note": "y" * 500}] * 4,
               "criterion": "z" * 400}
    line = bench.compact_line(_full_artifact(scaling))
    assert len(line) <= 1800
    d = json.loads(line)
    # everything an adjudication needs rides in the last line itself
    assert d["value"] == 1097.37 and d["unit"] == "urls/sec"
    assert d["queries"]["crawl_e2e"] == 50.274
    assert len(d["queries"]) == len(bench.HEADLINE) + 1
    assert d["crawl_runs_s"] == [55.602, 50.274]
    assert d["value_mean"] == 1041.9
    assert d["canary_pre"] == 0.204 and d["canary_post"] == 0.081
    assert d["scaling_eff"] == 0.881
    assert d["full_artifact"] == "BENCH_FULL.json"


def test_compact_line_survives_missing_scaling_and_list_form():
    assert json.loads(bench.compact_line(_full_artifact(None)))[
        "scaling_eff"] is None
    lst = [{"scaling_efficiency": 0.7}, {"scaling_efficiency": 0.88}]
    assert json.loads(bench.compact_line(_full_artifact(lst)))[
        "scaling_eff"] == 0.88
    err = {"error": "unreadable"}
    assert json.loads(bench.compact_line(_full_artifact(err)))[
        "scaling_eff"] is None


def test_compact_line_never_exceeds_window_even_when_bloated():
    art = _full_artifact(None)
    art["metric"] = "m" * 1200  # pathological metric string
    art["queries"] = {f"query_with_a_long_name_{i:03d}": 123.456
                      for i in range(120)}  # pathological query set
    line = bench.compact_line(art)
    assert len(line) <= 1800
    assert json.loads(line)["full_artifact"] == "BENCH_FULL.json"
