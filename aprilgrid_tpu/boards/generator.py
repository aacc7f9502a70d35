"""Kalibr-compatible AprilGrid chart generation.

Port of the reference's standalone board generator
(scripts/generate_aprilgrid.py): a (2x+1) x (2y+1) checkerboard of
spacing squares and AprilTags laid out row-major from the bottom-left
(reference :1114-1167), each tag drawn as a black marker square with its
code bits opened as white cells row-major inside the border
(gen_square_tag, reference :1066-1112). Output formats: SVG (hand-rolled
XML — no svgwrite dependency), PNG (PIL raster), PDF (PIL), and the
Kalibr-style JSON config (reference :967-975).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np

from ..families import get_family


@dataclasses.dataclass
class AprilGridBoard:
    """Board geometry (reference BaseAprilGrid, :952-975)."""

    size_x: int = 6
    size_y: int = 6
    marker_length_meter: float = 0.088
    tag_spacing: float = 0.3
    border_bits: int = 2
    first_marker: int = 0
    tag_family: str = "t36h11"
    page_width_meter: float = 0.8
    page_height_meter: float = 0.8

    def file_name(self) -> str:
        return (
            f"{self.tag_family}_{self.size_x}x{self.size_y}"
            f"_start_id_{self.first_marker}"
        )

    def to_config(self) -> dict:
        return {
            "tag_size_meter": self.marker_length_meter,
            "tag_spacing": self.tag_spacing,
            "tag_rows": self.size_y,
            "tag_cols": self.size_x,
            "first_id": self.first_marker,
        }


def _board_rects(board: AprilGridBoard) -> list[tuple[float, float, float, float, str]]:
    """All rectangles of the chart as (x, y, w, h, color) in mm.

    Mirrors the reference layout math (add_patterns_on_svg, :1118-1167):
    rows walk from the page bottom upward, columns left to right;
    even/even cells are spacing squares, odd-row cells are tags.
    """
    spec = get_family(board.tag_family)
    nbits = spec.edge * spec.edge
    codes = [
        format(int(c), f"0{nbits}b")
        for c in spec.codes[board.first_marker :]
    ]

    page_w = board.page_width_meter * 1000.0
    page_h = board.page_height_meter * 1000.0
    small = board.marker_length_meter * board.tag_spacing * 1000.0
    marker = board.marker_length_meter * 1000.0

    shift_x = (page_w - board.size_x * (marker + small) - small) / 2.0
    shift_y = (page_h - board.size_y * (marker + small) - small) / 2.0

    rects: list[tuple[float, float, float, float, str]] = [
        (0.0, 0.0, page_w, page_h, "white")
    ]

    def tag_rects(x, y, sq, code, border_bits):
        out = [(x, y, sq, sq, "black")]
        if code:
            bits = spec.edge
            block = bits + 2 * border_bits
            cell = sq / block
            count = 0
            for r in range(border_bits, bits + border_bits):
                for c in range(border_bits, bits + border_bits):
                    if code[count] == "1":
                        out.append((x + c * cell, y + r * cell, cell, cell, "white"))
                    count += 1
        return out

    for row in range(board.size_y * 2 + 1):
        start_y = page_h - shift_y
        start_y -= ((row + 2) // 2) * small
        start_y -= ((row + 1) // 2) * marker
        for col in range(board.size_x * 2 + 1):
            start_x = shift_x
            start_x += (col + 1) // 2 * small
            start_x += col // 2 * marker
            if (row + col) % 2 != 0:
                continue
            if row % 2 == 0:
                rects.append((start_x, start_y, small, small, "black"))
            else:
                code = codes.pop(0)
                rects.extend(
                    tag_rects(start_x, start_y, marker, code, board.border_bits)
                )
    return rects


def svg_string(board: AprilGridBoard) -> str:
    page_w = board.page_width_meter * 1000.0
    page_h = board.page_height_meter * 1000.0
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{page_w}mm" '
        f'height="{page_h}mm" viewBox="0 0 {page_w} {page_h}">'
    ]
    for (x, y, w, h, color) in _board_rects(board):
        parts.append(
            f'<rect x="{x:.6f}" y="{y:.6f}" width="{w:.6f}" '
            f'height="{h:.6f}" fill="{color}"/>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def render_png(board: AprilGridBoard, pixels_per_mm: float = 4.0) -> np.ndarray:
    """Rasterize the chart to a grayscale uint8 image."""
    from PIL import Image, ImageDraw

    page_w = board.page_width_meter * 1000.0
    page_h = board.page_height_meter * 1000.0
    wpx = int(round(page_w * pixels_per_mm))
    hpx = int(round(page_h * pixels_per_mm))
    img = Image.new("L", (wpx, hpx), 255)
    draw = ImageDraw.Draw(img)
    for (x, y, w, h, color) in _board_rects(board):
        v = 0 if color == "black" else 255
        draw.rectangle(
            [
                round(x * pixels_per_mm),
                round(y * pixels_per_mm),
                round((x + w) * pixels_per_mm) - 1,
                round((y + h) * pixels_per_mm) - 1,
            ],
            fill=v,
        )
    return np.asarray(img, dtype=np.uint8)


def generate_chart(
    board: AprilGridBoard,
    out_dir: str | Path = ".",
    name: str | None = None,
    formats: tuple[str, ...] = ("svg", "png", "pdf", "json"),
    pixels_per_mm: float = 4.0,
) -> dict[str, Path]:
    """Write the chart in the requested formats; returns {format: path}."""
    from PIL import Image

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    base = out_dir / (name or board.file_name())
    written: dict[str, Path] = {}
    if "svg" in formats:
        p = base.with_suffix(".svg")
        p.write_text(svg_string(board))
        written["svg"] = p
    if "png" in formats or "pdf" in formats:
        arr = render_png(board, pixels_per_mm)
        if "png" in formats:
            p = base.with_suffix(".png")
            Image.fromarray(arr).save(p)
            written["png"] = p
        if "pdf" in formats:
            p = base.with_suffix(".pdf")
            Image.fromarray(arr).save(p, "PDF", resolution=25.4 * pixels_per_mm)
            written["pdf"] = p
    if "json" in formats:
        p = base.with_suffix(".json")
        p.write_text(json.dumps(board.to_config(), indent=2))
        written["json"] = p
    return written
