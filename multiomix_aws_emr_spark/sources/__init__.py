from multiomix_aws_emr_spark.sources.tables import (  # noqa: F401
    TABLE_NAMES,
    events_v,
    load,
    with_events_v,
)
