"""Terminal image preview: truecolor half-block rendering.

The reference displays the accumulating render in a GLFW window refreshed
every frame (include/GL/cl_gl_interop.h:174, drawGL).  On a TPU pod there
is no GL; the closest faithful analogue is drawing the tonemapped image
into the terminal with 24-bit ANSI half-blocks (U+2580: foreground colors
the top pixel, background the bottom), giving 2 pixels per character cell
in any truecolor terminal.  The interactive shell redraws it in place for
a live progressive view.
"""
from __future__ import annotations

import numpy as np

_HALF = "▀"  # upper half block


def downsample(img: np.ndarray, max_cols: int, max_rows_px: int
               ) -> np.ndarray:
    """Box-average [H,W,3] uint8/float to fit a max_cols x max_rows_px/2
    character grid (2 image rows per character row)."""
    h, w = img.shape[:2]
    fx = max(1, int(np.ceil(w / max_cols)))
    fy = max(1, int(np.ceil(h / max_rows_px)))
    f = max(fx, fy)
    hh = h // f * f
    ww = w // f * f
    x = img[:hh, :ww].reshape(hh // f, f, ww // f, f, -1)
    return x.mean(axis=(1, 3))


def ansi_image(ldr: np.ndarray, max_cols: int = 64,
               max_rows: int = 28) -> str:
    """Tonemapped [H,W,3] in [0,1] -> ANSI half-block string."""
    small = downsample(np.asarray(ldr, np.float32), max_cols, max_rows * 2)
    u8 = np.clip(small[..., :3] * 255.0 + 0.5, 0, 255).astype(np.int32)
    if u8.shape[0] % 2:
        u8 = np.concatenate([u8, np.zeros_like(u8[:1])], axis=0)
    top = u8[0::2]
    bot = u8[1::2]
    lines = []
    for r in range(top.shape[0]):
        cells = []
        for c in range(top.shape[1]):
            tr, tg, tb = top[r, c]
            br, bg, bb = bot[r, c]
            cells.append(f"\x1b[38;2;{tr};{tg};{tb}m"
                         f"\x1b[48;2;{br};{bg};{bb}m{_HALF}")
        lines.append("".join(cells) + "\x1b[0m")
    return "\n".join(lines)


CURSOR_HOME = "\x1b[H"
CLEAR = "\x1b[2J"
