from .windows import stream_tumbling_agg

__all__ = ["stream_tumbling_agg"]
