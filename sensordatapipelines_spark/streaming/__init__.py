from sensordatapipelines_spark.streaming.interval_agg import (  # noqa: F401
    read_events_stream,
    stream_interval_aggregate,
    stream_windowed_aggregate,
)
from sensordatapipelines_spark.streaming.stateful import (  # noqa: F401
    stream_running_stats,
    stream_sessionize,
)
