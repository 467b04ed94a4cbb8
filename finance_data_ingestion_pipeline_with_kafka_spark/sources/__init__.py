from .replay import (
    kafka_shaped_file_stream,
    kafka_source_options,
    kafka_stream,
    write_json_fixture,
)

__all__ = [
    "kafka_shaped_file_stream",
    "kafka_source_options",
    "kafka_stream",
    "write_json_fixture",
]
