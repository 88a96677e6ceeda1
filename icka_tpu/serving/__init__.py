"""Serving-time machinery: length-bucketed batch dispatch."""

from icka_tpu.serving.bucketed import (  # noqa: F401
    BucketedGateCLServer,
    BucketedICKAServer,
    ServingStats,
    pick_bucket,
    sample_tweet_lengths,
)
