

def test_quality_composite_decomposes():
    """The composite equals 4*keep + 2*ent_ok + ttr_ok of the individual
    oracle-pinned kernels, and each component actually varies."""
    import pyarrow.parquet as pq

    import ray.data

    from agentic_doc_ray.functions.text import (
        char_entropy_batch,
        doc_ttr_batch,
        gopher_quality_flags_batch,
        quality_composite,
    )

    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    sw = ("the", "a", "data", "value")
    got = (
        quality_composite(ray.data.from_arrow(tbl).repartition(3), stopwords=sw)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    keep = gopher_quality_flags_batch(tbl, sw).to_pandas().set_index("doc_id")["keep"]
    ent = char_entropy_batch(tbl).to_pandas().set_index("doc_id")["entropy_micro"]
    ttr = doc_ttr_batch(tbl).to_pandas().set_index("doc_id")["ttr_per_mille"]
    for d in got.index:
        e_ok = 1 if ent[d] >= 2_000_000 else 0
        t_ok = 1 if ttr[d] >= 300 else 0
        assert got.loc[d, "score"] == 4 * keep[d] + 2 * e_ok + t_ok
    assert got["score"].nunique() > 1  # the score separates documents
