"""The interleaved text+media documents table — the engine's primary input.

Schema (BASELINE.json input_hint):

    doc_id: string
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

`kind` in {text, media, geometry}; geometry spans carry a GeoJSON geometry
string in `text`; media spans carry a `media_ref` id.  The per-row invariant
every operator must preserve is SPAN-SEQUENCE EQUALITY: (kind, text,
media_ref, order) of the spans array is untouched by spatial processing —
geometries are *extracted* into a side table keyed by (doc_id, offset), never
mutated in place.

``synth_documents`` generates the deterministic small-scale stand-in
(FIXTURES.md F9): DISTRIBUTED (mapInPandas over spark.range) and
PARALLELISM-INDEPENDENT — every random draw is a splitmix64 hash of
(seed, doc_index, tag), so local[8] and local[32] produce byte-identical
tables (the two-cluster scaling evidence requires identical input).  Includes
Zipf-ish "hot cell" clusters so skew/salting paths are exercised.  At 10^12
docs the same schema arrives as an Iceberg table.
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.geo import parse_geojson
from ..kernels import cells as KC

__all__ = ["DOCS_SCHEMA", "synth_documents", "extract_geometry_spans",
           "span_signature"]

DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("spans", T.ArrayType(T.StructType([
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ])), False),
])

_WORDS = ("spatial join tile index polygon point cell shuffle arrow span "
          "document media raster vector zoom mercator batch").split()

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(v: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the deterministic per-row random source."""
    v = (v.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    v = ((v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    v = ((v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return v ^ (v >> np.uint64(31))


def _u01(idx: np.ndarray, seed: int, tag: int) -> np.ndarray:
    """Uniform [0,1) per row, keyed by (seed, row index, tag)."""
    seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    h = _splitmix64(
        idx.astype(np.uint64) ^ seed_mix ^ (np.uint64(tag) << np.uint64(40))
    )
    return (h >> np.uint64(11)).astype(np.float64) * (2.0 ** -53)


def synth_documents(
    spark: SparkSession,
    n_docs: int = 10_000,
    seed: int = 42,
    geometry_frac: float = 0.3,
    hot_clusters: int = 3,
    hot_frac: float = 0.25,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic interleaved documents table (FIXTURES.md F9)."""
    world = 0.6 * KC.MERC_MAX
    # hot cluster centers from the seed itself
    hc = np.arange(hot_clusters, dtype=np.uint64)
    hot_x = (_u01(hc, seed, 900) * 2 - 1) * world
    hot_y = (_u01(hc, seed, 901) * 2 - 1) * world
    max_spans = 8

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx = pdf["id"].to_numpy().astype(np.uint64)
            n = len(idx)
            n_spans = (1 + (_u01(idx, seed, 1) * max_spans)).astype(np.int64)
            n_spans = np.clip(n_spans, 1, max_spans)
            has_geom = _u01(idx, seed, 2) < geometry_frac
            geom_slot = (_u01(idx, seed, 3) * n_spans).astype(np.int64)
            # per-(doc, span) draws, tag-separated
            per_span = {}
            for s in range(max_spans):
                key = idx * np.uint64(max_spans) + np.uint64(s)
                per_span[s] = {
                    "delta": (1 + _u01(key, seed, 10) * 49).astype(np.int64),
                    "is_media": _u01(key, seed, 11) < 0.2,
                    "nwords": (3 + _u01(key, seed, 12) * 7).astype(np.int64),
                    "w0": (_u01(key, seed, 13) * len(_WORDS)).astype(np.int64),
                }
            is_hot = _u01(idx, seed, 20) < hot_frac
            cluster = (_u01(idx, seed, 21) * hot_clusters).astype(np.int64)
            gx = np.where(
                is_hot,
                hot_x[cluster] + (_u01(idx, seed, 22) - 0.5) * 8_000,
                (_u01(idx, seed, 23) * 2 - 1) * world,
            )
            gy = np.where(
                is_hot,
                hot_y[cluster] + (_u01(idx, seed, 24) - 0.5) * 8_000,
                (_u01(idx, seed, 25) * 2 - 1) * world,
            )
            is_point = _u01(idx, seed, 26) < 0.5
            gw = 500 + _u01(idx, seed, 27) * 49_500
            gh = 500 + _u01(idx, seed, 28) * 49_500

            doc_ids = [f"doc{int(i):010d}" for i in idx]
            spans_col = []
            for r in range(n):
                spans = []
                offset = 0
                for s in range(int(n_spans[r])):
                    offset += int(per_span[s]["delta"][r])
                    if has_geom[r] and s == geom_slot[r]:
                        if is_point[r]:
                            g = {"type": "Point",
                                 "coordinates": [float(gx[r]), float(gy[r])]}
                        else:
                            x0, y0 = float(gx[r]), float(gy[r])
                            x1, y1 = x0 + float(gw[r]), y0 + float(gh[r])
                            g = {"type": "Polygon", "coordinates": [[
                                [x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0],
                            ]]}
                        spans.append(("geometry", json.dumps(g), None, offset))
                    elif per_span[s]["is_media"][r]:
                        spans.append(("media", None,
                                      f"media://{int(idx[r])}/{s}", offset))
                    else:
                        w0 = int(per_span[s]["w0"][r])
                        k = int(per_span[s]["nwords"][r])
                        txt = " ".join(
                            _WORDS[(w0 + j) % len(_WORDS)] for j in range(k)
                        )
                        spans.append(("text", txt, None, offset))
                spans_col.append(spans)
            yield pd.DataFrame({"doc_id": doc_ids, "spans": spans_col})

    base = spark.range(n_docs, numPartitions=partitions or None)
    return base.mapInPandas(gen, schema=DOCS_SCHEMA)


def extract_geometry_spans(docs: DataFrame) -> DataFrame:
    """documents -> geometry side table (doc_id, offset, geom struct).

    Pure Catalyst explode + filter, then ONE vectorized parse UDF.  The
    documents table itself is untouched (span-sequence equality invariant);
    spatial results re-join on doc_id.  Column pruning keeps media/text
    bytes of non-geometry spans out of downstream stages.
    """
    return (
        docs.select("doc_id", F.explode("spans").alias("span"))
        .where(F.col("span.kind") == "geometry")
        .select(
            "doc_id",
            F.col("span.offset").alias("offset"),
            parse_geojson(F.col("span.text")).alias("geom"),
        )
    )


def span_signature(docs: DataFrame) -> DataFrame:
    """(doc_id, sig) where sig hashes the full span sequence (kind, text,
    media_ref, order).  Used by tests to assert the invariant: run any
    pipeline, re-hash, compare."""
    return docs.select(
        "doc_id",
        F.sha2(
            F.to_json(
                F.transform(
                    "spans",
                    lambda s: F.struct(
                        s["kind"].alias("kind"),
                        s["text"].alias("text"),
                        s["media_ref"].alias("media_ref"),
                    ),
                )
            ),
            256,
        ).alias("sig"),
    )
