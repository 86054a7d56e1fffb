"""Geohash cell ids: the de-facto public interchange format for
geospatial bucketing (base32 strings whose PREFIX algebra is the
string-space twin of the engine's zkey integer-prefix algebra — a
geohash of precision p-1 is exactly the first p-1 characters of its
children, so prefix range scans `[gh, gh+1)` prune sorted storage the
same way cdx_range_scan and bbox_query do).

Construction is the classic bit-interleave, done as pure integer
expressions rendered identically into both engines (the house
dual-dialect discipline, functions/textexpr.Eng):

    n    = 5 * precision stream bits, lon takes the even stream
           positions starting at the MSB (so nlon = ceil(n/2) bits,
           nlat = floor(n/2))
    gx   = floor(((lon + 180) / 360) * 2^nlon), clamped to [0, 2^nlon)
    gy   = floor(((lat +  90) / 180) * 2^nlat), clamped likewise
    char c = alphabet[ Σ_{t=0..4} bit(5c + t) << (4 - t) ]

Everything after the two float grid quantizations is int64 bit
plumbing, so Spark and DuckDB produce byte-identical strings; the two
quantizations are a single rendered arithmetic text (same literals,
same op order → same IEEE result in both engines).

Scale shape: map-only — a handful of shift/mask terms plus an unrolled
p-char concat; no UDF, no shuffle, whole-stage-codegen friendly. At
10^12 rows the geohash column is just another narrow projection, and
sorting by it gives the same footer-pruned prefix scans the SURT/CDX
layer proves (tests/test_plans.py pattern).

Reference semantics are public: Niemeyer's geohash as documented on
the public wiki; test vectors (57.64911, 10.40744) → "u4pruydqqvj"
and (42.605, -5.603) → "ezs42" are the published examples, and the
fuzz oracle in tests/test_geohash.py is an independent pure-Python
interval-bisection encoder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linear_quadtree_spark.functions.textexpr import DUCK, SPARK, Eng

__all__ = [
    "GEOHASH_ALPHABET",
    "geohash_grid_exprs",
    "geohash_from_grid_expr",
    "with_geohash",
    "geohash_select_sql_duck",
    "geohash_decode_grid_exprs",
    "geohash_center_exprs",
    "geohash_neighbors_expr",
]

#: Standard geohash base32 (no a, i, l, o).
GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _nbits(precision: int) -> tuple[int, int]:
    n = 5 * precision
    return (n + 1) // 2, n // 2  # (nlon, nlat)


def geohash_grid_exprs(e: Eng, lon_col: str, lat_col: str, precision: int) -> tuple[str, str]:
    """(gx, gy) BIGINT grid-cell expressions at the bit widths geohash
    `precision` needs. One rendered arithmetic text for both engines —
    the only floating-point in the whole construction."""
    nlon, nlat = _nbits(precision)

    def axis(col: str, offset: str, span: str, bits: int) -> str:
        scale = 1 << bits
        raw = (
            f"CAST(FLOOR(((CAST({col} AS DOUBLE) + CAST({offset} AS DOUBLE))"
            f" / CAST({span} AS DOUBLE)) * CAST({scale} AS DOUBLE)) AS BIGINT)"
        )
        return (
            f"GREATEST(CAST(0 AS BIGINT), LEAST(CAST({scale - 1} AS BIGINT), {raw}))"
        )

    return axis(lon_col, "180.0", "360.0", nlon), axis(lat_col, "90.0", "180.0", nlat)


def geohash_from_grid_expr(e: Eng, gx_col: str, gy_col: str, precision: int) -> str:
    """Base32 geohash string from named (gx, gy) grid columns — pure
    int64 shift/mask terms unrolled per character (precision is a small
    compile-time constant), so name the grid columns first (a projection
    or CTE) rather than inlining the float quantization p times."""
    nlon, nlat = _nbits(precision)
    chars = []
    for c in range(precision):
        terms = []
        for t in range(5):
            j = 5 * c + t  # stream bit index, 0 = MSB
            if j % 2 == 0:
                src, pos = gx_col, nlon - 1 - j // 2
            else:
                src, pos = gy_col, nlat - 1 - (j - 1) // 2
            bit = f"({e.shiftr(src, str(pos))} % 2)"
            terms.append(f"{bit} * {1 << (4 - t)}" if t < 4 else bit)
        idx = f"({' + '.join(terms)})"
        fn = "substring" if e.name == "spark" else "substr"
        chars.append(f"{fn}('{GEOHASH_ALPHABET}', CAST({idx} AS INT) + 1, 1)")
    return f"concat({', '.join(chars)})"


def with_geohash(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    precision: int = 5,
    out: str = "gh",
) -> DataFrame:
    """Append a geohash column (map-only, UDF-free)."""
    gx, gy = geohash_grid_exprs(SPARK, lon_col, lat_col, precision)
    return (
        df.withColumn("_ghx", F.expr(gx))
        .withColumn("_ghy", F.expr(gy))
        .withColumn(out, F.expr(geohash_from_grid_expr(SPARK, "_ghx", "_ghy", precision)))
        .drop("_ghx", "_ghy")
    )


def _char_val(e: Eng, gh_col: str, c: int) -> str:
    """0-based alphabet index of character c (0-based) of a geohash
    column — `instr`/`strpos` against the constant alphabet, minus 1.
    Invalid characters yield -1 (callers on trusted engine output never
    see it; it keeps garbage input finite rather than NULL-poisoning)."""
    sub = "substring" if e.name == "spark" else "substr"
    pos = "instr" if e.name == "spark" else "strpos"
    return (
        f"(CAST({pos}('{GEOHASH_ALPHABET}', {sub}({gh_col}, {c + 1}, 1)) AS BIGINT)"
        f" - 1)"
    )


def geohash_decode_grid_exprs(e: Eng, gh_col: str, precision: int) -> tuple[str, str]:
    """(gx, gy) BIGINT grid cells decoded from a geohash string column —
    the exact inverse of geohash_from_grid_expr (pure integer bit
    plumbing, unrolled per character; precision is compile-time).

    CONTRACT (the hilbert.py clustering-key rule, measured here too):
    `gh_col` must be a MATERIALIZED column — read from storage, or
    persist()+count() first if just computed. Catalyst collapses
    projections, so decoding a freshly-built geohash chain inlines the
    entire encode expression into each of the 5·precision character
    probes (and 8× again under neighbors) — a combinatorial expression
    blow-up that OOMs the driver. Real decode reads stored strings,
    which is a natural barrier."""
    nlon, nlat = _nbits(precision)
    xs, ys = [], []
    for c in range(precision):
        v = _char_val(e, gh_col, c)
        for t in range(5):
            j = 5 * c + t  # stream bit, 0 = MSB
            bit = f"({e.shiftr(v, str(4 - t))} % 2)"
            if j % 2 == 0:
                xs.append(e.shiftl(bit, str(nlon - 1 - j // 2)))
            else:
                ys.append(e.shiftl(bit, str(nlat - 1 - (j - 1) // 2)))
    return f"({' + '.join(xs)})", f"({' + '.join(ys)})"


def geohash_center_exprs(e: Eng, gx_col: str, gy_col: str, precision: int) -> tuple[str, str]:
    """(lon, lat) DOUBLE cell-center expressions from named grid
    columns. The center is strictly interior to the cell, so
    re-encoding it returns the same geohash (round-trip law, tested)."""
    nlon, nlat = _nbits(precision)

    def axis(col: str, scale: int, span: str, offset: str) -> str:
        return (
            f"(CAST(-{offset} AS DOUBLE) + CAST({span} AS DOUBLE)"
            f" * ((CAST({col} AS DOUBLE) + CAST(0.5 AS DOUBLE))"
            f" / CAST({scale} AS DOUBLE)))"
        )

    return (
        axis(gx_col, 1 << nlon, "360.0", "180.0"),
        axis(gy_col, 1 << nlat, "180.0", "90.0"),
    )


def geohash_neighbors_expr(e: Eng, gx_col: str, gy_col: str, precision: int) -> str:
    """Array of the ≤8 neighboring geohash strings around named grid
    columns: longitude WRAPS (the antimeridian is adjacency, not an
    edge), latitude CLAMPS (cells at the poles have no north/south
    neighbor — those candidates drop out via list de-duplication of the
    self cell, matching how a radius probe over geohash buckets should
    behave). Pure expressions; fan-out is a constant 8."""
    nlon, nlat = _nbits(precision)
    cells = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            # wrap lon: (gx + dx + 2^nlon) % 2^nlon ; clamp lat
            nx = f"(({gx_col} + {dx} + {1 << nlon}) % {1 << nlon})"
            ny = (
                f"GREATEST(CAST(0 AS BIGINT), LEAST(CAST({(1 << nlat) - 1} AS BIGINT), "
                f"{gy_col} + {dy}))"
            )
            cells.append(geohash_from_grid_expr(e, nx, ny, precision))
    arr = f"array({', '.join(cells)})" if e.name == "spark" else f"[{', '.join(cells)}]"
    self_gh = geohash_from_grid_expr(e, gx_col, gy_col, precision)
    # drop duplicates (lat clamp collapses off-pole candidates onto
    # in-row cells) and never include the center cell itself
    return e.adistinct(e.filt(arr, "g", f"g <> {self_gh}"))


def geohash_select_sql_duck(
    src: str, lon_expr: str, lat_expr: str, precision: int, extra_cols: str = ""
) -> str:
    """DuckDB SELECT producing (gh[, extra_cols]) from `src` — the CTE
    twin of with_geohash, same rendered arithmetic."""
    gx, gy = geohash_grid_exprs(DUCK, lon_expr, lat_expr, precision)
    gh = geohash_from_grid_expr(DUCK, "_ghx", "_ghy", precision)
    extra = f", {extra_cols}" if extra_cols else ""
    return (
        f"SELECT {gh} AS gh{extra} FROM "
        f"(SELECT {gx} AS _ghx, {gy} AS _ghy{extra} FROM {src})"
    )
