"""The olive chunk format — pure pyarrow, no Spark dependency.

Write/read a multi-table chunk (reference src/chunk.zig:15-38) as one
self-describing file: ``[b"OLV1"][u32 header_len][JSON header][data]``.
"""

from olive_spark.format.errors import (  # noqa: F401
    BufferTooBig,
    DataSectionOverflow,
    DataSectionTooSmall,
    DecompressFail,
    InvalidBufferLen,
    LengthMismatch,
    OliveError,
    UnexpectedArrayType,
    ValidationError,
)
from olive_spark.format.reader import (  # noqa: F401
    ChunkReader,
    read_all_tables,
    read_chunk,
    select_pages,
)
from olive_spark.format.writer import ChunkWriter, write_chunk  # noqa: F401
