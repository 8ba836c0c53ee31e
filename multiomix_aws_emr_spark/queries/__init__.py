"""Declared query inventory (SURVEY.md §2.2): importing this package
registers every query + oracle into the registry."""

from multiomix_aws_emr_spark.queries import (  # noqa: F401
    aggregates,
    formats,
    graphs,
    llmdata,
    ml,
    omics,
    python_udfs,
    relational,
    scalars,
    similarity,
    streams,
    textops,
    windows,
)
from multiomix_aws_emr_spark.queries.registry import ORACLES, QUERIES  # noqa: F401
