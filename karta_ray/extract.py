"""HTML -> text extraction and geotag parsing, Arrow-native.

The engine's per-row invariant (BASELINE.json input_hint): extracted text
must be byte-identical per url, independent of batch boundaries — so
extraction is a pure vectorized function of the ``html`` column, built
entirely from pyarrow.compute kernels (RE2 regex + substring replace), no
Python per-row loop.

Page payloads live inside ``<article>...</article>`` with minimal HTML
entity escaping (&amp; &lt; &gt;); geotags are a fixed in-text pattern
``@geo(lat,lon)`` with 5-decimal fixed-point coordinates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ARTICLE_RE = r"(?s)<article>(?P<t>.*)</article>"
GEOTAG_RE = r"@geo\((?P<lat>-?\d+\.\d+),(?P<lon>-?\d+\.\d+)\)"


def escape_text(text_col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Minimal HTML escape (order: & < >)."""
    out = pc.replace_substring(text_col, "&", "&amp;")
    out = pc.replace_substring(out, "<", "&lt;")
    out = pc.replace_substring(out, ">", "&gt;")
    return out


def unescape_text(col):
    """Exact inverse of :func:`escape_text` (order: < > &)."""
    out = pc.replace_substring(col, "&lt;", "<")
    out = pc.replace_substring(out, "&gt;", ">")
    out = pc.replace_substring(out, "&amp;", "&")
    return out


def extract_text(html_col) -> pa.Array:
    """binary html -> extracted text (string), byte-identical to the
    original payload."""
    as_str = pc.cast(html_col, pa.string())
    m = pc.extract_regex(as_str, ARTICLE_RE)
    payload = pc.struct_field(m, "t")
    return unescape_text(payload)


def parse_geotag(text_col):
    """text -> (lon, lat) float64 arrays with NaN where no geotag."""
    m = pc.extract_regex(text_col, GEOTAG_RE)
    lat = pc.cast(pc.struct_field(m, "lat"), pa.float64())
    lon = pc.cast(pc.struct_field(m, "lon"), pa.float64())
    lon_np = lon.to_numpy(zero_copy_only=False)
    lat_np = lat.to_numpy(zero_copy_only=False)
    return (np.where(np.isnan(lon_np), np.nan, lon_np),
            np.where(np.isnan(lat_np), np.nan, lat_np))
