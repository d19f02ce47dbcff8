"""Multimodal feature-extraction pipeline on this engine.

Both fully-real pure-numpy codecs, end to end through the Arrow-batched
mapInPandas stages a 100 TB media lake would run:

  1. image side: REAL PPM payloads -> decode -> nearest-resize -> channel
     means + downsampled luma embedding (`decode_resize_features`),
  2. audio side: REAL PCM WAV payloads -> RIFF chunk-walk decode ->
     duration/RMS/zero-crossing/spectral features (`audio_features`),
  3. video side: metadata-level frame-sample planning (`frame_sample`),
  4. unified media-feature table written as Parquet, one row per item,
     with the modality-specific feature vector.

No shuffle anywhere until the final tiny per-kind rollup: decode and
feature extraction are embarrassingly parallel maps over Arrow batches,
payload bytes never touch the driver.

Run: python examples/multimodal_pipeline.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from ubparquet_spark.functions.multimodal import (
    audio_features,
    decode_resize_features,
    frame_sample,
    synth_media_df,
    synth_ppm_df,
    synth_wav_df,
)
from ubparquet_spark.io import write_parquet
from ubparquet_spark.session import get_session


def main(workdir: str) -> None:
    spark = get_session("multimodal-pipeline")

    # 1. image features over real PPM payloads
    images = synth_ppm_df(spark, n=24)
    img_feats = decode_resize_features(images, dst_w=16, dst_h=12)

    # 2. audio features over real PCM WAV payloads
    audio = synth_wav_df(spark, n=24)
    aud_feats = audio_features(audio)

    # 3. video frame-sampling plan (metadata-level; decode stays stubbed
    #    behind the env gate until a codec library is present)
    video = synth_media_df(spark, n=24).filter(F.col("kind") == "video")
    frames = frame_sample(video, every_k=10)

    # 4. unify: one feature row per media item
    unified = (
        img_feats.select(
            "media_id",
            F.lit("image").alias("kind"),
            F.col("feature").alias("feature"),
            F.col("mean_r").alias("scalar_a"),
            F.col("mean_g").alias("scalar_b"),
        )
        .unionByName(
            aud_feats.select(
                "media_id",
                F.lit("audio").alias("kind"),
                F.col("band_energy").alias("feature"),
                F.col("rms").alias("scalar_a"),
                F.col("zero_crossing_rate").alias("scalar_b"),
            )
        )
    )
    out = os.path.join(workdir, "media_features.parquet")
    write_parquet(unified, out)

    rollup = (
        unified.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.avg("scalar_a").alias("avg_a"),
        )
        .orderBy("kind")
        .collect()
    )
    for r in rollup:
        print(f"{r['kind']}: {r['n_items']} items, avg={r['avg_a']:.4f}")
    n_frames = frames.count()
    print(f"video frame plan: {n_frames} sampled frames")
    print(f"media features written: {out}")
    print("multimodal pipeline OK")


if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    main(wd)
