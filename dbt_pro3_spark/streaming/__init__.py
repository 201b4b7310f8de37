from .windows import session_agg, sliding_agg, tumbling_agg
from .watermark import windowed_stream_counts

__all__ = ["session_agg", "sliding_agg", "tumbling_agg", "windowed_stream_counts"]
