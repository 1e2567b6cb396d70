"""Deterministic synthetic sources.

The engine's primary input is an Iceberg/Parquet table of
Common-Crawl-style pages with the exact shape mandated by
BASELINE.json input_hint: ``(url string, warc_ts timestamp,
html binary, text string, lang string)``. No external data exists in
this sandbox, so this module synthesizes it: every column is a pure
function of ``(page_id, seed)`` — generation is embarrassingly
parallel (mapInPandas over ``spark.range``), identical at any
parallelism, and the per-url byte-identity invariant
``extract_text(html) == text`` holds by construction *and* is
re-verified by a real extraction function (tests/test_pages.py).

Geography: page coordinates are drawn with heavy clustering around
"city" hotspots so H3/S2 hot-cell skew is real (FIXTURES.md §1:
"clustered to create hot H3 cells for skew tests").
"""

from __future__ import annotations

import html as _htmlmod
import re

import numpy as np
import pandas as pd

from ..geom.wkb import polygon_to_wkb

# ------------------------------------------------------------ counter RNG

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — the per-row counter-based RNG.

    uint64 wraparound is the algorithm, not an error."""
    with np.errstate(over="ignore"):
        z = np.asarray(x, dtype=np.uint64) + _SM_GAMMA
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _h(ids: np.ndarray, seed: int, stream: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        key = splitmix64(np.uint64(seed) ^ (np.uint64(stream) * _SM_GAMMA))
        return splitmix64(np.asarray(ids, dtype=np.uint64) ^ key)


def _u(ids: np.ndarray, seed: int, stream: int) -> np.ndarray:
    """Uniform [0,1) per id for a named stream."""
    return (_h(ids, seed, stream) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


# ------------------------------------------------------------ text / html

_VOCAB = np.array(
    (
        "the of and to in for with on at from city river park north south "
        "bridge market station data map where travel local history museum "
        "street food garden harbor castle valley lake festival music art "
        "library university weather climate report open summer winter"
    ).split()
)

LANGS = np.array(["en", "fr", "de", "es", "pt", "it", "nl", "pl"])
_LANG_CUM = np.cumsum(
    np.array([0.45, 0.13, 0.11, 0.10, 0.07, 0.06, 0.05, 0.03])
)

_DUP_MOD = 13  # pages in the same dup family share canonical text


def _canon_ids(ids: np.ndarray, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Map ids to canonical text ids: ~8% exact dups, ~5% near dups."""
    ids = np.asarray(ids, dtype=np.uint64)
    roll = _h(ids, seed, 7) % np.uint64(100)
    family = ids - (ids % np.uint64(_DUP_MOD))
    canon = np.where(roll < 13, family, ids)
    near = (roll >= 8) & (roll < 13)  # near-dup: canonical text + suffix
    return canon, near


def build_text(ids: np.ndarray, seed: int = 42) -> np.ndarray:
    """Deterministic token sequences; exact/near duplicate structure."""
    ids = np.asarray(ids, dtype=np.uint64)
    canon, near = _canon_ids(ids, seed)
    n_words = 20 + (_h(canon, seed, 1) % np.uint64(60)).astype(np.int64)
    out = np.empty(len(ids), dtype=object)
    for i in range(len(ids)):
        k = int(n_words[i])
        widx = _h(
            canon[i] * np.uint64(1000) + np.arange(k, dtype=np.uint64), seed, 2
        ) % np.uint64(len(_VOCAB))
        words = _VOCAB[widx.astype(np.int64)]
        t = " ".join(words.tolist())
        if near[i]:
            t = t + " extra" + str(int(ids[i] % np.uint64(5)))
        out[i] = t
    return out


def build_html(ids: np.ndarray, texts: np.ndarray, seed: int = 42) -> np.ndarray:
    """Wrap text in deterministic boilerplate HTML (bytes)."""
    ids = np.asarray(ids, dtype=np.uint64)
    nav_pick = (_h(ids, seed, 3) % np.uint64(3)).astype(np.int64)
    navs = [
        '<nav><a href="/">home</a><a href="/about">about</a></nav>',
        '<nav><a href="/">index</a></nav>',
        "<nav></nav>",
    ]
    out = np.empty(len(ids), dtype=object)
    for i in range(len(ids)):
        body = _htmlmod.escape(str(texts[i]))
        page = (
            "<html><head><title>page "
            + str(int(ids[i]))
            + "</title></head><body>"
            + navs[nav_pick[i]]
            + "<article>"
            + body
            + "</article><footer>(c) example</footer></body></html>"
        )
        out[i] = page.encode("utf-8")
    return out


_ARTICLE_RE = re.compile(rb"<article>(.*?)</article>", re.S)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_text_bytes(html: bytes) -> str:
    """The real extraction function (html -> text).

    Pure: same bytes in -> same string out, the per-url byte-identity
    invariant of BASELINE.json input_hint. Plays the role of the
    reference's model-inference UDF (SURVEY.md §2.9 R2) for the
    web-text payload.
    """
    m = _ARTICLE_RE.search(html)
    if not m:
        return ""
    inner = m.group(1).decode("utf-8", errors="replace")
    inner = _TAG_RE.sub("", inner)
    return _htmlmod.unescape(inner)


# ------------------------------------------------------------ geography

# "cities": (lat, lon, weight) — fixed hotspots driving cell skew
_CITIES = np.array(
    [
        (40.71, -74.00, 0.18),
        (51.50, -0.12, 0.12),
        (48.85, 2.35, 0.10),
        (35.68, 139.69, 0.08),
        (19.43, -99.13, 0.06),
        (-23.55, -46.63, 0.06),
        (52.52, 13.40, 0.05),
        (28.61, 77.20, 0.05),
    ]
)
_CITY_CUM = np.cumsum(_CITIES[:, 2]) / _CITIES[:, 2].sum() * 0.7  # 70% clustered


def build_latlon(ids: np.ndarray, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    u_pick = _u(ids, seed, 4)
    city_idx = np.searchsorted(_CITY_CUM, u_pick)
    clustered = city_idx < len(_CITIES)
    # clustered: gaussian around city via Box-Muller on two uniforms
    u1 = np.clip(_u(ids, seed, 5), 1e-12, 1.0)
    u2 = _u(ids, seed, 6)
    r = np.sqrt(-2.0 * np.log(u1)) * 0.08  # sigma ~0.08 deg
    g1 = r * np.cos(2 * np.pi * u2)
    g2 = r * np.sin(2 * np.pi * u2)
    ci = np.clip(city_idx, 0, len(_CITIES) - 1)
    lat_c = _CITIES[ci, 0] + g1
    lon_c = _CITIES[ci, 1] + g2
    # uniform elsewhere
    lat_u = _u(ids, seed, 8) * 170.0 - 85.0
    lon_u = _u(ids, seed, 9) * 360.0 - 180.0
    lat = np.where(clustered, lat_c, lat_u)
    lon = np.where(clustered, lon_c, lon_u)
    return np.clip(lat, -85.0, 85.0), ((lon + 180.0) % 360.0) - 180.0


# ------------------------------------------------------------ pages table

PAGES_SCHEMA = (
    "page_id long, url string, warc_ts timestamp, html binary, "
    "text string, lang string, lat double, lon double"
)


def pages_pdf(ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """One Arrow batch of synthetic pages for the given ids."""
    ids = np.asarray(ids, dtype=np.uint64)
    texts = build_text(ids, seed)
    htmls = build_html(ids, texts, seed)
    lat, lon = build_latlon(ids, seed)
    hosts = (_h(ids, seed, 10) % np.uint64(997)).astype(np.int64)
    urls = np.array(
        [f"https://host{h}.example/p/{int(i)}" for h, i in zip(hosts, ids)],
        dtype=object,
    )
    base = np.datetime64("2025-06-01T00:00:00")
    offs = (_h(ids, seed, 11) % np.uint64(30 * 24 * 3600)).astype("timedelta64[s]")
    ts = base + offs
    lang_u = _u(ids, seed, 12)
    lang = LANGS[np.searchsorted(_LANG_CUM, lang_u).clip(0, len(LANGS) - 1)]
    return pd.DataFrame(
        {
            "page_id": ids.astype(np.int64),
            "url": urls,
            "warc_ts": ts,
            "html": htmls,
            "text": texts,
            "lang": lang,
            "lat": lat,
            "lon": lon,
        }
    )


def pages_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed synthetic pages DataFrame of ``n`` rows.

    Uses mapInPandas over spark.range so generation scales with the
    cluster; rows depend only on (id, seed), never on partitioning.
    """
    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield pages_pdf(pdf["id"].to_numpy(), seed)

    return base.mapInPandas(gen, schema=PAGES_SCHEMA)


# ------------------------------------------------------------ polygon layers

def admin_grid_polygons() -> pd.DataFrame:
    """A deterministic 8x4 world grid of rectangular admin areas.

    Rectangles make the PIP join's expected result expressible in
    plain SQL (floor arithmetic) for the DuckDB oracle, while the
    engine still exercises the full generic WKB/PIP machinery.
    area_id = ix * 4 + iy, ix = floor((lon+180)/45), iy = floor((lat+90)/45).
    """
    rows = []
    for ix in range(8):
        for iy in range(4):
            minx, maxx = -180.0 + 45.0 * ix, -180.0 + 45.0 * (ix + 1)
            miny, maxy = -90.0 + 45.0 * iy, -90.0 + 45.0 * (iy + 1)
            ring = np.array(
                [
                    [minx, miny],
                    [maxx, miny],
                    [maxx, maxy],
                    [minx, maxy],
                    [minx, miny],
                ]
            )
            rows.append(
                {
                    "area_id": ix * 4 + iy,
                    "name": f"grid_{ix}_{iy}",
                    "value": float(ix * 4 + iy),
                    "geom_wkb": polygon_to_wkb([ring]),
                    "crs": "EPSG:4326",
                }
            )
    return pd.DataFrame(rows)


def synth_admin_polygons(n_areas: int = 64, seed: int = 7) -> pd.DataFrame:
    """Irregular convex admin polygons (jittered hexagons) clustered
    near the page hotspots — shape of FIXTURES.md §2."""
    rng = np.random.RandomState(seed)
    rows = []
    for a in range(n_areas):
        if a < len(_CITIES) * 4:
            c = _CITIES[a % len(_CITIES)]
            cx = c[1] + rng.uniform(-0.5, 0.5)
            cy = c[0] + rng.uniform(-0.5, 0.5)
            radius = rng.uniform(0.05, 0.4)
        else:
            cx = rng.uniform(-170, 170)
            cy = rng.uniform(-75, 75)
            radius = rng.uniform(0.5, 6.0)
        k = rng.randint(5, 9)
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rr = radius * rng.uniform(0.6, 1.0, k)
        xs = cx + rr * np.cos(ang)
        ys = np.clip(cy + rr * np.sin(ang), -89.5, 89.5)
        ring = np.column_stack([xs, ys])
        ring = np.vstack([ring, ring[:1]])
        rows.append(
            {
                "area_id": a,
                "name": f"area_{a}",
                "value": float(a % 10 + 1),
                "geom_wkb": polygon_to_wkb([ring]),
                "crs": "EPSG:4326",
            }
        )
    return pd.DataFrame(rows)


def admin_polygons_df(spark, pdf: pd.DataFrame | None = None):
    if pdf is None:
        pdf = synth_admin_polygons()
    return spark.createDataFrame(
        pdf, schema="area_id long, name string, value double, geom_wkb binary, crs string"
    )


def write_pages_partitioned(
    spark, n: int, path: str, part_res: int = 4, seed: int = 42,
    partitions: int | None = None, n_buckets: int | None = 64,
):
    """Materialize the pages table partitioned for source pruning
    (SURVEY.md §4 — the parquet stand-in for an Iceberg table with a
    bucket(N, cell) partition spec).

    Directory layout is ``bucket = pmod(xxhash64(cell), N)``, NOT one
    directory per raw cell value: a coarse-res cell column has
    thousands of distinct values (1000+ tiny dirs observed at res 3 in
    round 1), while N buckets bound the directory count regardless of
    resolution or skew. The raw cell column stays in the data, so a
    cell-equality query prunes twice: partition pruning on the bucket
    (read 1/N of the files) then parquet row-group stats on the cell.
    Use ``pages_cell_predicate`` to build the two-level filter.
    ``n_buckets=None`` falls back to raw value partitioning.
    Returns the cell column name."""
    from ..operators.geocode import hex_cell_udf
    from pyspark.sql import functions as F

    col = f"cell_h{part_res}"
    df = pages_df(spark, n, seed=seed, partitions=partitions)
    df = df.withColumn(col, hex_cell_udf(part_res)(F.col("lat"), F.col("lon")))
    if n_buckets is None:
        df.write.mode("overwrite").partitionBy(col).parquet(path)
    else:
        bcol = f"{col}_bkt"
        df = df.withColumn(
            bcol, F.pmod(F.xxhash64(F.col(col)), F.lit(int(n_buckets))).cast("int")
        )
        df.write.mode("overwrite").partitionBy(bcol).parquet(path)
    return col


def pages_cell_predicate(col: str, cell: int, n_buckets: int = 64):
    """Filter for one cell on a bucket-partitioned pages table:
    bucket equality (partition pruning) AND cell equality (row-group
    stats + exactness) — what Iceberg derives automatically from its
    bucket transform."""
    from pyspark.sql import functions as F

    bkt = (
        F.pmod(F.xxhash64(F.lit(int(cell)).cast("long")), F.lit(int(n_buckets)))
        .cast("int")
    )
    return (F.col(f"{col}_bkt") == bkt) & (F.col(col) == int(cell))
