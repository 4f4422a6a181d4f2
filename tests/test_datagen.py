"""Datagen invariants: determinism, byte-identical text extraction,
geotag round-trip, skew shape (FIXTURES.md §1)."""

import collections

import numpy as np

from coastsat_spark.datagen import SF_ROWS, gen_batch, webpages_df
from coastsat_spark.functions import cells
from coastsat_spark.functions.text import extract_text_bytes, parse_geotag_bytes


def test_generation_is_pure_function_of_index():
    a = gen_batch(np.arange(0, 3000))
    b = gen_batch(np.arange(0, 3000)[::3])
    assert (b["html"].to_numpy() == a["html"].to_numpy()[::3]).all()
    assert (b["url"].to_numpy() == a["url"].to_numpy()[::3]).all()


def test_text_extraction_byte_identical():
    pdf = gen_batch(np.arange(0, 4000))
    for h, t in zip(pdf["html"], pdf["text"]):
        assert extract_text_bytes(h) == t


def test_geotag_roundtrip_exact():
    pdf = gen_batch(np.arange(0, 2000))
    for h, la, lo in zip(pdf["html"], pdf["_lat"], pdf["_lon"]):
        glat, glon = parse_geotag_bytes(h)
        assert glat == round(la, 6) and glon == round(lo, 6)


def test_urls_unique():
    pdf = gen_batch(np.arange(0, 5000))
    assert pdf["url"].nunique() == len(pdf)


def test_zipf_skew_present():
    pdf = gen_batch(np.arange(0, 5000))
    tile, _, _ = cells.np_fine_to_tile_pixel(pdf["_lat"].to_numpy(), pdf["_lon"].to_numpy())
    counts = collections.Counter(tile)
    top = counts.most_common(1)[0][1]
    # a coastal-dense cell concentrates >5% of all docs (salting fixture)
    assert top / len(pdf) > 0.05


def test_spark_generation_matches_oracle(spark):
    sdf = webpages_df(spark, 2000, with_truth=True).orderBy("url").toPandas()
    idx = sdf["url"].str.rsplit("/", n=1).str[-1].astype(int).to_numpy()
    oracle = gen_batch(idx)
    assert (sdf["html"].map(bytes).to_numpy() == oracle["html"].to_numpy()).all()
    assert (sdf["text"].to_numpy() == oracle["text"].to_numpy()).all()
    assert SF_ROWS[0.001] == 6_000
