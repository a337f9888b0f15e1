"""Plotting + native-build-loader units.

utils/plotting.py runs behind try/except in the conversion/estimation
paths (a broken import or API drift would silently produce NO pngs while
every other test stays green), so each function gets a direct smoke test;
native/_build.py's staleness rule guards the ABI of every engine."""

import os
import time

import numpy as np
import pytest


class TestPlotting:
    def test_save_mel_png(self, tmp_path):
        from dvc_tpu.utils.plotting import save_mel_png
        p = str(tmp_path / "mel.png")
        ok = save_mel_png(np.random.RandomState(0).rand(80, 40), p, "t")
        assert ok and os.path.getsize(p) > 1000

    def test_encoding_visualization(self, tmp_path):
        from dvc_tpu.utils.plotting import encoding_visualization
        p = str(tmp_path / "lat.png")
        ok = encoding_visualization(np.random.RandomState(1).randn(32), p, "s0")
        assert ok and os.path.getsize(p) > 1000

    def test_projection_plot(self, tmp_path):
        from dvc_tpu.utils.plotting import projection_plot
        p = str(tmp_path / "proj.png")
        e = np.random.RandomState(2).randn(12, 16)
        labels = ["a"] * 6 + ["b"] * 6
        ok = projection_plot(e, labels, p)
        assert ok and os.path.getsize(p) > 1000

    def test_plot_latent_analysis(self, tmp_path):
        from dvc_tpu.utils.plotting import plot_latent_analysis
        p = str(tmp_path / "analysis.png")
        mus = np.random.RandomState(3).randn(3, 32)
        stds = np.abs(np.random.RandomState(4).randn(3, 32)) + 0.1
        ok = plot_latent_analysis(mus, stds, ["s1", "s2", "s3"], p)
        assert ok and os.path.getsize(p) > 1000


class TestBuildStaleness:
    def test_stale_rules(self, tmp_path):
        from dvc_tpu.native._build import _stale
        src = tmp_path / "x.cpp"
        so = tmp_path / "x.so"
        src.write_text("// src")
        # missing .so -> stale
        assert _stale(str(src), str(so))
        so.write_text("bin")
        now = time.time()
        os.utime(src, (now - 100, now - 100))
        os.utime(so, (now, now))
        assert not _stale(str(src), str(so))
        # source newer than binary -> stale
        os.utime(src, (now + 100, now + 100))
        assert _stale(str(src), str(so))
        # shared header newer than binary -> stale
        os.utime(src, (now - 100, now - 100))
        hdr = tmp_path / "dvc_common.h"
        hdr.write_text("// hdr")
        os.utime(hdr, (now + 100, now + 100))
        assert _stale(str(src), str(so))
