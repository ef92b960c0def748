"""Multimodal plumbing tests beyond the oracle parity: the resize stage's
closure parameterization and the frame sampler's kind filtering/expansion
arithmetic (SURVEY build-brief: plumbing real, decode stubbed)."""

from __future__ import annotations

from data_pipelines_course_spark.datasets import load
from data_pipelines_course_spark.operators import multimodal as M

from .conftest import SF_DIR


def test_resize_binds_target_dims(spark):
    media = M.media_from_documents(load(spark, SF_DIR, "documents")).limit(20)
    out = M.resize_media(media, 320, 240).collect()
    assert len(out) == 20
    assert all(r.width == 320 and r.height == 240 for r in out)
    assert all(r.payload_bytes >= 320 * 240 for r in out)


def test_frame_sample_only_videos_and_even_spacing(spark):
    media = M.media_from_documents(load(spark, SF_DIR, "documents"))
    videos = media.filter("kind = 'video'").count()
    frames = M.media_frame_sample(spark, SF_DIR)
    rows = frames.collect()
    assert len(rows) == videos * M.FRAMES_PER_VIDEO
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    sample = by_media[sorted(by_media)[0]]
    sample.sort(key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in sample] == list(range(M.FRAMES_PER_VIDEO))
    assert sample[0].frame_ts_ms == 0
    # evenly spaced: idx*dur//4 is non-decreasing with equal gaps (±1 floor)
    gaps = [sample[i + 1].frame_ts_ms - sample[i].frame_ts_ms
            for i in range(len(sample) - 1)]
    assert max(gaps) - min(gaps) <= 1
