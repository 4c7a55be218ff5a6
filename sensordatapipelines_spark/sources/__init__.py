from sensordatapipelines_spark.sources.readers import (  # noqa: F401
    open_data,
    open_dir_of_data,
    open_sensor_records,
    open_spatial_data,
    read_table,
)
from sensordatapipelines_spark.sources.sinks import write_geojson, write_table  # noqa: F401
