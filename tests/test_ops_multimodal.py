"""Multimodal column plumbing: schema, actor stage, deterministic stub."""

import numpy as np
import pytest
import ray.data

from zeeklog_ray.ops.multimodal import (
    FEATURE_DIM,
    MediaFeatureExtractor,
    extract_features,
    media_schema,
    synth_media_table,
)


def test_synth_table_schema():
    t = synth_media_table(50)
    assert t.schema.equals(media_schema())
    assert len(t) == 50
    # deterministic
    assert t.equals(synth_media_table(50))


def test_extractor_unit_deterministic():
    ex = MediaFeatureExtractor()
    t = synth_media_table(8)
    out1, out2 = ex(t), ex(t)
    assert out1.equals(out2)
    assert out1.column_names == ["item_id", "modality", "n_bytes", "features"]
    f = out1["features"][0].as_py()
    assert len(f) == FEATURE_DIM and all(0.0 <= x <= 1.0 for x in f)
    # modality personalizes the digest: same bytes, different modality → diff
    p = t["payload"][0].as_py()
    assert not np.allclose(ex._decode(p, "image"), ex._decode(p, "audio"))


def test_real_decoder_is_explicit_stub():
    ex = MediaFeatureExtractor(decoder="real")
    with pytest.raises(NotImplementedError):
        ex._decode(b"bytes", "image")
    with pytest.raises(ValueError):
        MediaFeatureExtractor(decoder="nope")


def test_actor_pool_pipeline(ray_session):
    ds = ray.data.from_arrow(synth_media_table(200))
    out = extract_features(ds, batch_size=32).to_pandas()
    assert len(out) == 200
    assert (out["n_bytes"] > 0).all()
    assert out["features"].map(len).eq(FEATURE_DIM).all()
