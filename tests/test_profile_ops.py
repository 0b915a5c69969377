"""Unit tests for the per-op roofline audit's pure analysis functions.

The trace capture needs a live accelerator (exercised manually via
``tools/profile_ops.py``; its tables are in PERF.md) — here we pin the
parsing/aggregation contract against a synthetic xprof ``roofline_model``
table so format drift in xprof or refactors of the summary math fail
loudly.
"""

import json

import pytest

from tools.profile_ops import roofline_rows, summarize


def _table(rows):
    cols = [
        "step", "rank", "category", "operation", "occurrences",
        "total_time", "avg_time", "total_self_time", "bound_by",
        "roofline_efficiency", "compute_efficiency", "measured_flop_rate",
        "measured_memory_bw", "operational_intensity", "dma_stall_percent",
        "hlo_module_id",
    ]
    return [{
        "cols": [{"id": c} for c in cols],
        "rows": [
            {"c": [{"v": r.get(c)} if r.get(c) is not None else None
                   for c in cols]}
            for r in rows
        ],
    }]


def _write(tmp_path, rows):
    p = tmp_path / "fake.xplane.pb"
    p.write_bytes(b"")
    return p, _table(rows)


class TestRooflineRows:
    def _rows_from(self, monkeypatch, tmp_path, rows):
        path, table = _write(tmp_path, rows)

        class FakeConverter:
            @staticmethod
            def xspace_to_tool_data(paths, tool, params):
                assert tool == "roofline_model"
                return json.dumps(table), "application/json"

        # roofline_rows does `from xprof.convert import raw_to_tool_data`
        # at call time — patch the real submodule's entry point
        import xprof.convert.raw_to_tool_data as rtd

        monkeypatch.setattr(
            rtd, "xspace_to_tool_data", FakeConverter.xspace_to_tool_data
        )
        return roofline_rows(str(path))

    def test_filters_and_dedupes(self, monkeypatch, tmp_path):
        base = {"step": "Total", "total_self_time": 10.0, "occurrences": 3,
                "bound_by": "HBM", "roofline_efficiency": 0.5,
                "compute_efficiency": 0.1, "hlo_module_id": "1"}
        rows = [
            dict(base, category="Program", operation="Program"),
            dict(base, category="convolution fusion", operation="fusion.1"),
            dict(base, category="convolution fusion", operation="fusion.1"),
            dict(base, category="loop fusion", operation="IDLE"),
            dict(base, step="1", category="loop fusion", operation="f.2"),
            dict(base, category="loop fusion", operation="f.2",
                 total_self_time=4.0),
        ]
        got = self._rows_from(monkeypatch, tmp_path, rows)
        names = sorted(r["operation"] for r in got)
        # Program + IDLE + non-Total + duplicate all dropped
        assert names == ["f.2", "fusion.1"]
        f1 = [r for r in got if r["operation"] == "fusion.1"][0]
        assert f1["self_time_us"] == 10.0
        assert f1["bound_by"] == "HBM"
        assert f1["roofline_efficiency"] == 0.5

    def test_missing_cells_default(self, monkeypatch, tmp_path):
        rows = [{"step": "Total", "category": "copy", "operation": "c.1",
                 "hlo_module_id": "1"}]
        got = self._rows_from(monkeypatch, tmp_path, rows)
        assert got[0]["self_time_us"] == 0.0
        assert got[0]["occurrences"] == 0
        assert got[0]["roofline_efficiency"] == 0.0


class TestSummarize:
    def test_limiter_aggregation(self, capsys):
        rows = [
            {"operation": "a", "category": "conv", "self_time_us": 3000.0,
             "occurrences": 3, "bound_by": "Compute",
             "roofline_efficiency": 0.8, "compute_efficiency": 0.8},
            {"operation": "b", "category": "conv", "self_time_us": 1000.0,
             "occurrences": 3, "bound_by": "Compute",
             "roofline_efficiency": 0.4, "compute_efficiency": 0.4},
            {"operation": "c", "category": "copy", "self_time_us": 2000.0,
             "occurrences": 3, "bound_by": "HBM",
             "roofline_efficiency": 0.5, "compute_efficiency": 0.0},
        ]
        summarize(rows, reps=2, top=2)
        out = capsys.readouterr().out
        # total self time: 6000us / 2 reps = 3.0 ms/step
        assert "3.0 ms/step" in out
        # Compute time-weighted eff: (3000*0.8 + 1000*0.4)/4000 = 0.70
        assert " 70.0%" in out
        # top-2 listing keeps the largest op first and drops the third
        table = out.split("-" * 20)[-1]
        assert table.index("a ") < table.index("c ")
        assert "\nb " not in table
