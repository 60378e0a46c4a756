from .segment import (  # noqa: F401
    segment_sum,
    segment_max,
    segment_mean,
    segment_softmax_sum,
    segment_weighted_softmax_sum,
)
