"""Video encoding for rollout recordings.

Counterpart of the reference's VideoRecorder encoding path
(``/root/reference/torchrl/record/recorder.py:43`` hands frames to
torchvision/moviepy writers).  Here: animated GIF via Pillow (always
available), MP4 via an ``ffmpeg`` binary when present on PATH, and a
pure-python MJPEG AVI writer (RIFF container + Pillow JPEG frames) so a
real video container is always producible without ffmpeg.

Frames are ``[T, H, W, C]`` uint8 (HWC, TPU-native layout); float inputs
in [0, 1] are converted.
"""
from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np

__all__ = ["write_gif", "write_mp4", "write_avi", "write_video",
           "write_notebook", "write_trajectory_viewer"]


def _to_uint8_frames(video) -> np.ndarray:
    arr = np.asarray(video)
    if arr.ndim == 3:  # [T, H, W] grayscale
        arr = arr[..., None]
    if arr.ndim != 4:
        raise ValueError(f"expected [T, H, W, C] frames, got {arr.shape}")
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 if arr.max() <= 1.0 else arr, 0, 255)
        arr = arr.astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, -1)
    elif arr.shape[-1] != 3:
        # n-channel occupancy grids (MinAtar-style): colorize each channel
        # with a distinct hue and max-combine into RGB
        C = arr.shape[-1]
        palette = np.array(
            [[255, 80, 80], [80, 255, 80], [80, 120, 255], [255, 255, 80],
             [255, 80, 255], [80, 255, 255], [255, 160, 60], [200, 200, 200]],
            np.float32)
        pal = palette[np.arange(C) % len(palette)]  # [C, 3]
        arr = np.max(arr[..., None] / 255.0 * pal, axis=-2).astype(np.uint8)
    return arr


def write_gif(video, path: str, fps: int = 30) -> str:
    """Encode ``[T, H, W, C]`` frames as an animated GIF (Pillow)."""
    from PIL import Image

    arr = _to_uint8_frames(video)
    frames = [Image.fromarray(f) for f in arr]
    duration = max(1, int(round(1000.0 / fps)))
    frames[0].save(
        path, save_all=True, append_images=frames[1:], duration=duration,
        loop=0,
    )
    return path


def write_mp4(video, path: str, fps: int = 30) -> str:
    """Encode frames as MP4 by piping raw RGB into ``ffmpeg``.

    Raises RuntimeError when no ffmpeg binary is on PATH (this image has
    none — use :func:`write_video` for the automatic GIF fallback).
    """
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError("no ffmpeg binary on PATH; use write_gif")
    arr = _to_uint8_frames(video)
    T, H, W, _ = arr.shape
    cmd = [
        ffmpeg, "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
        "-s", f"{W}x{H}", "-r", str(fps), "-i", "-",
        "-pix_fmt", "yuv420p", "-vcodec", "libx264", path,
    ]
    proc = subprocess.run(cmd, input=arr.tobytes(), capture_output=True)
    if proc.returncode != 0:
        raise RuntimeError(f"ffmpeg failed: {proc.stderr[-500:]!r}")
    return path


def write_avi(video, path: str, fps: int = 30, quality: int = 90) -> str:
    """Encode frames as an MJPEG AVI — pure python (struct + Pillow JPEG),
    no external binary.  Every mainstream player decodes MJPG; this is the
    no-ffmpeg stand-in for the reference's mp4 output."""
    import io
    import struct

    from PIL import Image

    arr = _to_uint8_frames(video)
    T, H, W, _ = arr.shape
    jpegs = []
    for f in arr:
        buf = io.BytesIO()
        Image.fromarray(f).save(buf, format="JPEG", quality=quality)
        data = buf.getvalue()
        if len(data) % 2:  # RIFF chunks are word-aligned
            data += b"\x00"
        jpegs.append(data)
    max_size = max(len(j) for j in jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(payload)) + payload

    def lst(four: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", four + payload)

    avih = struct.pack(
        "<14I", int(1e6 // fps), max_size * fps, 0, 0x10,  # HASINDEX
        T, 0, 1, max_size, W, H, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sI2H8I4h", b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, T,
        max_size, 0xFFFFFFFF, 0, 0, 0, W, H)
    strf = struct.pack("<I2i2H2I2i2I", 40, W, H, 1, 24, 0x47504A4D,  # 'MJPG'
                       W * H * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_payload = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_payload)
    # idx1: offsets relative to the start of the 'movi' fourcc + 4
    idx, off = [], 4
    for j in jpegs:
        idx.append(struct.pack("<4s3I", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j)
    idx1 = chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(chunk(b"RIFF", body))
    return path


def write_html(video, path: str, fps: int = 30, title: str = "rl_tpu rollout") -> str:
    """Self-contained HTML player: the rollout as a base64-embedded GIF with
    play/pause/restart controls — the reference render stack's in-browser
    playback (reference render/, notebook/WASM viewers) without needing a
    notebook or a WASM build.  Opens in any browser, no server."""
    import base64
    import io
    import os
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".gif", delete=False) as f:
        tmp = f.name
    try:
        write_gif(video, tmp, fps=fps)
        with open(tmp, "rb") as f:
            b64 = base64.b64encode(f.read()).decode()
    finally:
        os.unlink(tmp)
    html = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>body{{background:#111;color:#eee;font-family:monospace;
text-align:center;padding:2em}} img{{image-rendering:pixelated;
width:min(80vw,640px);border:1px solid #444}}
button{{margin:1em .3em;padding:.4em 1.2em;font-family:monospace}}</style>
</head><body>
<h3>{title}</h3>
<img id="v" src="data:image/gif;base64,{b64}">
<div>
<button onclick="const i=document.getElementById('v');i.src=i.src;">restart</button>
</div>
<p>{fps} fps &middot; generated by rl_tpu.render</p>
</body></html>"""
    with open(path, "w") as f:
        f.write(html)
    return path


def write_video(video, path: str, fps: int = 30) -> str:
    """Encode to the container implied by ``path``'s extension.  ``.mp4``
    falls back to MJPEG AVI (suffix swap) when no ffmpeg binary exists."""
    if path.endswith(".gif"):
        return write_gif(video, path, fps)
    if path.endswith(".avi"):
        return write_avi(video, path, fps)
    try:
        return write_mp4(video, path, fps)
    except RuntimeError:
        return write_avi(video, os.path.splitext(path)[0] + ".avi", fps)


def write_trajectory_viewer(video, path: str, *, scalars: dict | None = None,
                            fps: int = 30, max_frames: int = 600,
                            scale: int = 1,
                            title: str = "rl_tpu trajectory") -> str:
    """Interactive single-file HTML trajectory viewer: play/pause, frame
    scrubber, per-step scalar readout and a reward sparkline.

    The browser-interactive analogue of the reference's web render stack
    (``/root/reference/torchrl/record/render/`` serves rollouts to an
    interactive browser view; its MuJoCo-WASM scene path needs an
    emscripten toolchain absent from this image, so this viewer renders the
    recorded frame stream instead).  Everything is inlined (frames as
    base64 JPEGs) — open the file anywhere, no server.

    ``scalars``: mapping name -> [T]-array (reward, value, action, ...),
    shown for the scrubbed step; a ``reward`` entry also draws the
    sparkline.  Long rollouts are strided down to ``max_frames``.
    """
    import base64
    import io
    import json

    from PIL import Image

    arr = _to_uint8_frames(video)
    T = arr.shape[0]
    stride = max(1, -(-T // max_frames))
    idx = np.arange(0, T, stride)
    frames64 = []
    for i in idx:
        img = Image.fromarray(arr[i])
        if scale != 1:
            img = img.resize((img.width * scale, img.height * scale),
                             Image.NEAREST)
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=85)
        frames64.append(base64.b64encode(buf.getvalue()).decode())

    scal = {}
    for name, vals in (scalars or {}).items():
        v = np.asarray(vals, np.float64).reshape(-1)[: T][idx]
        scal[name] = [round(float(x), 5) for x in v]

    payload = json.dumps(dict(frames=frames64, scalars=scal,
                              steps=[int(i) for i in idx], fps=int(fps)))
    html = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>__TITLE__</title><style>
body{font-family:monospace;background:#111;color:#ddd;margin:2em auto;max-width:720px}
img{image-rendering:pixelated;border:1px solid #444;max-width:100%}
input[type=range]{width:100%}button{font-family:monospace;margin-right:.5em}
#scalars td{padding:0 1em 0 0}canvas{width:100%;height:60px;background:#181818}
</style></head><body>
<h3>__TITLE__</h3>
<img id="f"><canvas id="spark" width="700" height="60"></canvas>
<input type="range" id="s" min="0" value="0">
<div><button id="play">play</button><span id="info"></span></div>
<table id="scalars"></table>
<script>
const D=__DATA__;let t=0,timer=null;
const img=document.getElementById('f'),sl=document.getElementById('s'),
 info=document.getElementById('info'),tbl=document.getElementById('scalars'),
 cv=document.getElementById('spark'),cx=cv.getContext('2d');
sl.max=D.frames.length-1;
function draw(){img.src='data:image/jpeg;base64,'+D.frames[t];sl.value=t;
 info.textContent=' step '+D.steps[t]+' / '+D.steps[D.steps.length-1];
 tbl.innerHTML=Object.entries(D.scalars).map(([k,v])=>
  '<tr><td>'+k+'</td><td>'+v[t]+'</td></tr>').join('');
 spark();}
function spark(){const r=D.scalars.reward;cx.clearRect(0,0,cv.width,cv.height);
 if(!r)return;const lo=Math.min(...r),hi=Math.max(...r),sp=hi-lo||1;
 cx.strokeStyle='#6c6';cx.beginPath();
 r.forEach((v,i)=>{const x=i/(r.length-1||1)*cv.width,
  y=cv.height-4-(v-lo)/sp*(cv.height-8);i?cx.lineTo(x,y):cx.moveTo(x,y)});
 cx.stroke();cx.strokeStyle='#e66';cx.beginPath();
 const x=t/(r.length-1||1)*cv.width;cx.moveTo(x,0);cx.lineTo(x,cv.height);cx.stroke();}
sl.oninput=()=>{t=+sl.value;draw()};
document.getElementById('play').onclick=function(){
 if(timer){clearInterval(timer);timer=null;this.textContent='play';return}
 this.textContent='pause';
 timer=setInterval(()=>{t=(t+1)%D.frames.length;draw()},1000/D.fps);};
document.addEventListener('keydown',e=>{
 if(e.key==='ArrowRight'){t=Math.min(t+1,D.frames.length-1);draw()}
 else if(e.key==='ArrowLeft'){t=Math.max(t-1,0);draw()}
 else if(e.key===' '){e.preventDefault();
  document.getElementById('play').click()}});
draw();
</script></body></html>"""
    html = html.replace("__TITLE__", title).replace("__DATA__", payload)
    with open(path, "w") as f:
        f.write(html)
    return path


def write_notebook(video, path: str, *, scalars: dict | None = None,
                   stats: dict | None = None, fps: int = 10,
                   title: str = "rl_tpu rollout") -> str:
    """Jupyter-notebook rollout export (reference ``rlrender`` notebook
    output, ``/root/reference/torchrl/render/``): a ready-to-open ``.ipynb``
    whose outputs are PRE-POPULATED — a stats table, the rollout as an
    embedded animated GIF ``display_data`` output, and a reward sparkline
    cell — so the notebook shows the rollout without executing anything
    (and the code cells re-render from the sidecar data when run).

    An ipynb is plain JSON (nbformat 4), so no notebook toolchain is
    needed to WRITE it.
    """
    import base64
    import io
    import json
    import tempfile

    frames = _to_uint8_frames(video)
    with tempfile.NamedTemporaryFile(suffix=".gif", delete=False) as tmp:
        gif_path = tmp.name
    try:
        write_gif(frames, gif_path, fps=fps)
        with open(gif_path, "rb") as f:
            gif_b64 = base64.b64encode(f.read()).decode()
    finally:
        import os as _os

        _os.unlink(gif_path)

    def md(source):
        return {"cell_type": "markdown", "metadata": {},
                "source": source.splitlines(keepends=True)}

    def code(source, outputs):
        return {"cell_type": "code", "metadata": {}, "execution_count": 1,
                "source": source.splitlines(keepends=True),
                "outputs": outputs}

    stats_lines = "\n".join(f"| {k} | {v} |" for k, v in (stats or {}).items())
    cells = [
        md(f"# {title}\n\n| stat | value |\n|---|---|\n{stats_lines}\n"),
        code(
            "from IPython.display import Image\n"
            f"Image(filename={title!r} + '.gif')  # embedded below\n",
            [{"output_type": "display_data",
              "data": {"image/gif": gif_b64},
              "metadata": {}}],
        ),
    ]
    if scalars:
        rows = {k: [float(x) for x in list(v)] for k, v in scalars.items()}
        ascii_spark = ""
        r = rows.get("reward")
        if r:
            lo, hi = min(r), max(r)
            span = (hi - lo) or 1.0
            marks = "▁▂▃▄▅▆▇█"
            ascii_spark = "".join(
                marks[int((x - lo) / span * (len(marks) - 1))] for x in
                r[:: max(1, len(r) // 80)])
        cells.append(code(
            "scalars = " + json.dumps(rows)[:200000] + "\n"
            "import matplotlib\n"
            "# plot scalars['reward'] etc. when run interactively\n",
            [{"output_type": "stream", "name": "stdout",
              "text": [f"reward sparkline: {ascii_spark}\n"]}],
        ))
    nb = {
        "nbformat": 4, "nbformat_minor": 5,
        "metadata": {"kernelspec": {"name": "python3",
                                    "display_name": "Python 3",
                                    "language": "python"}},
        "cells": cells,
    }
    with open(path, "w") as f:
        json.dump(nb, f)
    return path
