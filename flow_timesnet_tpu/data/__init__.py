from .schema import DataSchema, resolve_schema  # noqa: F401
from .pivot import (  # noqa: F401
    normalize_id,
    normalize_series_name,
    pivot_long_to_wide,
    fit_series_scaler,
    transform_dataframe,
    transform_array,
    inverse_transform,
)
from .split import make_holdout_slices, make_rolling_slices  # noqa: F401
from .windows import SlidingWindowSource, WindowBatcher, WindowBatch, build_batcher  # noqa: F401
from .time_features import build_time_features  # noqa: F401
from .static_features import compute_series_features  # noqa: F401
