from logshipper_spark.sources.transcripts import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
    role_dim,
    tool_dim,
)
from logshipper_spark.sources.tableio import TableIO  # noqa: F401
from logshipper_spark.sources.command import command_source  # noqa: F401
