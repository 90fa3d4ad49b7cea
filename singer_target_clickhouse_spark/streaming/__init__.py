from .driver import KafkaStreamingDriver, StreamingDriver, kafka_source_available  # noqa: F401
