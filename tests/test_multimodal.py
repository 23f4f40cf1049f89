"""Multimodal plumbing tests: binary column, metadata struct, mapInPandas
decode contract (real PPM/WAV kernels), column-pruning behavior."""

from pyspark.sql import functions as F

from gcp_cloudsql_to_bigquery_spark.catalog import load
from gcp_cloudsql_to_bigquery_spark.operators.multimodal import as_media_table
from gcp_cloudsql_to_bigquery_spark.workload import queries

SF = "/root/testdata/sf0.001"


def test_media_table_schema(spark):
    media = as_media_table(load(spark, SF, "documents"))
    kinds = dict(media.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["media_type"] == "string"
    assert kinds["meta"].startswith("struct<origin:string,content_length:bigint,lang:string")


def test_decode_features_routes_by_media_type(spark):
    rows = queries()["multimodal_decode_features"](spark, SF).collect()
    by_id = {r.doc_id: r for r in rows}
    # one feature row per non-video payload, each decoded by its own kernel
    docs = load(spark, SF, "documents").select("doc_id").collect()
    expect = {r.doc_id for r in docs if r.doc_id % 3 in (0, 1)}
    assert set(by_id) == expect
    for r in rows:
        if r.doc_id % 3 == 0:
            assert r.media_type == "image/ppm"
            assert r.width is not None and r.height is not None
            assert r.n_samples is None
        else:
            assert r.media_type == "audio/wav"
            assert r.width is None and r.height is None
            assert r.n_samples is not None and r.n_samples >= 100


def test_metadata_query_prunes_payload(spark):
    # metadata rollup must not read the payload bytes except octet_length;
    # check the scan's ReadSchema doesn't include the full text column beyond
    # what the byte-length needs — structural: plan contains no mapInPandas
    df = queries()["multimodal_metadata_stats"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_decode_projects_payload_away(spark):
    out = queries()["multimodal_decode_features"](spark, SF)
    assert "payload" not in out.columns


def test_ppm_decode_rejects_corrupt_payloads():
    """The real decoder must fail loudly on malformed headers and on
    truncated pixel buffers — silent garbage means silent wrong features."""
    import pandas as pd
    import pytest as _pytest

    from gcp_cloudsql_to_bigquery_spark.operators.multimodal import decode_ppm_batch

    bad_header = pd.DataFrame({"doc_id": [1], "payload": [b"JFIF\x00\x01garbage"]})
    with _pytest.raises(ValueError, match="not a P6"):
        list(decode_ppm_batch(iter([bad_header])))

    truncated = pd.DataFrame({"doc_id": [2], "payload": [b"P6\n4 4\n255\n" + b"\x00" * 10]})
    with _pytest.raises(ValueError, match="pixel buffer"):
        list(decode_ppm_batch(iter([truncated])))


def test_wav_decode_rejects_corrupt_payloads():
    import struct

    import pandas as pd
    import pytest as _pytest

    from gcp_cloudsql_to_bigquery_spark.operators.multimodal import decode_wav_batch

    not_riff = pd.DataFrame({"doc_id": [1], "payload": [b"OggS" + b"\x00" * 40]})
    with _pytest.raises(ValueError, match="not a RIFF"):
        list(decode_wav_batch(iter([not_riff])))

    # valid container, no data chunk
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    headless = pd.DataFrame(
        {"doc_id": [2], "payload": [b"RIFF" + struct.pack("<I", len(body)) + body]}
    )
    with _pytest.raises(ValueError, match="missing fmt/data"):
        list(decode_wav_batch(iter([headless])))


def test_resize_halves_dims_and_preserves_planes():
    """Pure-kernel check: resize(synthesize(x)) decodes to ceil-half dims
    with constant planes invariant and the gradient mean equal to k-1."""
    import pandas as pd

    from gcp_cloudsql_to_bigquery_spark.operators.multimodal import (
        decode_ppm_batch,
        resize_ppm_batch,
        synthesize_ppm_batch,
    )

    src = pd.DataFrame({"doc_id": [7, 123, 4000], "n_chars": [100, 57, 999]})
    media = next(synthesize_ppm_batch(iter([src])))
    small = next(resize_ppm_batch(iter([media])))
    out = next(decode_ppm_batch(iter([small])))
    for i, (doc_id, n_chars) in enumerate(zip(src["doc_id"], src["n_chars"])):
        w, h = n_chars % 64 + 8, doc_id % 48 + 8
        assert out["width"][i] == (w + 1) // 2
        assert out["height"][i] == (h + 1) // 2
        assert out["mean_r"][i] == doc_id % 256
        assert out["mean_b"][i] == (doc_id * 31) % 256
        assert out["mean_g"][i] == (h + 1) // 2 - 1

    import pytest as _pytest

    bad = pd.DataFrame({"doc_id": [1], "payload": [b"GIF89a..."]})
    with _pytest.raises(ValueError, match="not a P6"):
        list(resize_ppm_batch(iter([bad])))
