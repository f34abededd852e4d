"""Video encoding tests — GIF + pure-python MJPEG AVI (the no-ffmpeg
stand-in for the reference recorder's mp4 output, recorder.py:43)."""
import io
import os
import struct

import numpy as np
import pytest

from rl_tpu.record.video import write_avi, write_gif, write_video


@pytest.fixture
def frames():
    rng = np.random.default_rng(0)
    return (rng.random((8, 24, 32, 3)) * 255).astype(np.uint8)


class TestAvi:
    def test_riff_structure(self, frames, tmp_path):
        p = write_avi(frames, str(tmp_path / "v.avi"), fps=10)
        data = open(p, "rb").read()
        assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
        assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
        for marker in (b"hdrl", b"movi", b"idx1", b"MJPG", b"00dc"):
            assert marker in data, marker

    def test_frames_decode(self, frames, tmp_path):
        from PIL import Image

        p = write_avi(frames, str(tmp_path / "v.avi"), fps=10)
        data = open(p, "rb").read()
        i = data.find(b"00dc")
        n = struct.unpack("<I", data[i + 4:i + 8])[0]
        img = Image.open(io.BytesIO(data[i + 8:i + 8 + n]))
        img.load()
        assert img.size == (32, 24)

    def test_multichannel_colorized(self, tmp_path):
        # MinAtar-style 6-channel occupancy grid must colorize, not crash
        grid = np.zeros((4, 10, 10, 6), np.float32)
        grid[:, 2, 3, 1] = 1.0
        p = write_avi(grid, str(tmp_path / "g.avi"))
        assert os.path.getsize(p) > 0

    def test_mp4_falls_back_to_avi(self, frames, tmp_path):
        # no ffmpeg in this image → write_video swaps the suffix
        p = write_video(frames, str(tmp_path / "v.mp4"), fps=10)
        assert p.endswith(".avi") and os.path.exists(p)


class TestGif:
    def test_roundtrip(self, frames, tmp_path):
        from PIL import Image

        p = write_gif(frames, str(tmp_path / "v.gif"), fps=10)
        img = Image.open(p)
        assert img.n_frames == 8

    def test_float_input(self, tmp_path):
        vid = np.random.rand(3, 8, 8, 3).astype(np.float32)
        p = write_gif(vid, str(tmp_path / "f.gif"))
        assert os.path.getsize(p) > 0


class TestRenderCli:
    def test_video_out(self, tmp_path):
        from rl_tpu.render.cli import main

        stats = main(["--env", "rl_tpu.envs.minatar.BreakoutEnv",
                      "--steps", "10",
                      "--out", str(tmp_path / "b.avi")])
        assert os.path.exists(stats["out"])


class TestLoggerMonitor:
    def test_counter_schedule_and_rates(self, tmp_path):
        from rl_tpu.record import CSVLogger, Every, LoggerMonitor

        class FakeRB:
            def __init__(self):
                self.n = 0

            def stats(self):
                return {"size": self.n}

        logger = CSVLogger("mon_test", log_dir=str(tmp_path))
        mon = LoggerMonitor(logger, background=False)
        rb = FakeRB()
        mon.watch(rb, "rb", Every.counter("size", 10))
        mon.step(now=0.0)          # baseline, nothing logged
        rb.n = 25                  # crosses 10 and 20 → one log
        assert mon.step(now=1.0) == 1
        rb.n = 27                  # same decade → nothing
        assert mon.step(now=2.0) == 0
        rb.n = 31
        assert mon.step(now=3.0) == 1
        vals = logger.read_scalar("rb/size")
        assert [float(v) for _, v in vals] == [25.0, 31.0]
        # rate derivation between the two logged polls
        rate = logger.read_scalar("rb/size_per_s")
        assert abs(float(rate[-1][1]) - (31 - 25) / 2.0) < 1e-6

    def test_counter_reset_rebaselines(self):
        from rl_tpu.record import Every, LoggerMonitor

        class L:
            def __init__(self): self.calls = []
            def log_scalar(self, k, v, step=None): self.calls.append((k, v))

        class FakeColl:
            def __init__(self): self.frames_collected = 0
            def stats(self): return {"frames_collected": self.frames_collected}

        mon = LoggerMonitor(L(), background=False)
        c = FakeColl()
        mon.watch(c, "coll", Every.counter("frames_collected", 100))
        mon.step(now=0.0)
        c.frames_collected = 150
        assert mon.step(now=1.0) == 1
        c.frames_collected = 0     # restored/reset → re-baseline, no log
        assert mon.step(now=2.0) == 0

    def test_real_buffer_protocol(self):
        import jax.numpy as jnp

        from rl_tpu.data import TDict
        from rl_tpu.data.replay import ReplayBuffer

        rb = ReplayBuffer(capacity=32)
        rb.extend(TDict(x=jnp.ones((4, 2))))
        assert rb.stats() == {"size": 4, "capacity": 32}


class TestHtmlRender:
    def test_write_html_self_contained(self, tmp_path):
        import numpy as np

        from rl_tpu.record import write_html

        frames = (np.random.rand(8, 16, 16, 3) * 255).astype(np.uint8)
        out = str(tmp_path / "roll.html")
        write_html(frames, out, fps=10)
        html = open(out).read()
        assert "data:image/gif;base64," in html
        assert "<html" in html and len(html) > 1000

    def test_render_cli_html(self, tmp_path):
        from rl_tpu.render.cli import main

        out = str(tmp_path / "b.html")
        stats = main(["--env", "rl_tpu.envs.minatar.BreakoutEnv",
                      "--steps", "20", "--out", out])
        assert stats["out"] == out
        assert "base64" in open(out).read()


def test_trajectory_viewer(tmp_path):
    """Interactive HTML viewer: frames inlined, scalars embedded, long
    rollouts strided to max_frames."""
    import json
    import re

    from rl_tpu.record import write_trajectory_viewer

    vid = (np.random.rand(40, 16, 16, 3) * 255).astype(np.uint8)
    out = str(tmp_path / "t.view.html")
    write_trajectory_viewer(
        vid, out, scalars={"reward": np.arange(40.0)}, fps=10, max_frames=10)
    html = open(out).read()
    m = re.search(r"const D=(\{.*?\});let", html, re.DOTALL)
    data = json.loads(m.group(1))
    assert len(data["frames"]) == len(data["steps"]) == 10  # strided 40→10
    assert data["steps"][1] - data["steps"][0] == 4
    assert data["scalars"]["reward"][1] == 4.0  # strided with the frames
    assert data["fps"] == 10
    # frames are valid base64 JPEG
    import base64
    assert base64.b64decode(data["frames"][0])[:2] == b"\xff\xd8"


def test_trajectory_viewer_html_structure(tmp_path):
    """Golden STRUCTURE test (VERDICT r4 next #10): the interactive viewer
    must stay a self-contained document with the load-bearing elements —
    scrub slider, play toggle, frame <img>, scalar sparkline canvas,
    keyboard bindings — and must reference no external resources."""
    import re

    from rl_tpu.record import write_trajectory_viewer

    vid = (np.random.rand(6, 8, 8, 3) * 255).astype(np.uint8)
    out = str(tmp_path / "g.view.html")
    write_trajectory_viewer(vid, out, scalars={"reward": np.arange(6.0)},
                            fps=5)
    html = open(out).read()
    # document shell
    assert html.lstrip().lower().startswith("<!doctype html")
    # required interactive elements by id
    for el in ('id="f"', 'id="spark"', 'id="s"', 'id="play"',
               'id="info"', 'id="scalars"', '<input type="range"'):
        assert el in html, f"viewer lost element {el}"
    # inline script drives it; no external fetches of any kind
    assert "<script>" in html and "</script>" in html
    assert not re.search(r'src\s*=\s*"https?://', html)
    assert not re.search(r'href\s*=\s*"https?://', html)
    # data URI frames (self-contained playback)
    assert "data:image/jpeg;base64" in html
    # keyboard scrubbing stays wired
    assert "keydown" in html and "ArrowRight" in html


def test_notebook_export(tmp_path):
    """.ipynb rollout export (reference rlrender notebook path): valid
    nbformat-4 JSON with a pre-populated GIF display output and the stats
    table, openable without execution."""
    import base64
    import json

    from rl_tpu.envs.minatar import BreakoutEnv
    from rl_tpu.render.cli import render_checkpoint

    out = str(tmp_path / "roll.ipynb")
    stats = render_checkpoint(None, BreakoutEnv(), steps=10, out=out)
    nb = json.load(open(out))
    assert nb["nbformat"] == 4
    kinds = [c["cell_type"] for c in nb["cells"]]
    assert kinds[0] == "markdown" and "| stat | value |" in "".join(
        nb["cells"][0]["source"])
    gif = nb["cells"][1]["outputs"][0]["data"]["image/gif"]
    assert base64.b64decode(gif)[:6] in (b"GIF87a", b"GIF89a")
    spark = "".join(nb["cells"][2]["outputs"][0]["text"])
    assert "sparkline" in spark
    assert stats["out"] == out


def test_trajectory_viewer_cli(tmp_path):
    from rl_tpu.envs.minatar import BreakoutEnv
    from rl_tpu.render.cli import render_checkpoint

    out = str(tmp_path / "b.view.html")
    stats = render_checkpoint(None, BreakoutEnv(), steps=12, out=out)
    assert stats["out"] == out
    assert "spark" in open(out).read()
