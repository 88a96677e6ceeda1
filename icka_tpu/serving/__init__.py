"""Serving-time machinery: length-bucketed and sequence-packed dispatch."""

from icka_tpu.serving.bucketed import (  # noqa: F401
    BucketedGateCLServer,
    BucketedICKAServer,
    ServingStats,
    pick_bucket,
    sample_tweet_lengths,
)
from icka_tpu.serving.packing import (  # noqa: F401
    PackedGateCLServer,
    PackedStats,
    pack_first_fit,
)
