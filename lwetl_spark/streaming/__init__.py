from lwetl_spark.streaming.pipeline import stream_events_tumbling, stream_to_memory
from lwetl_spark.streaming.multimodal import decode_binary_features

__all__ = ["stream_events_tumbling", "stream_to_memory", "decode_binary_features"]
