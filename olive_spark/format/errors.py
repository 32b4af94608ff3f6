"""Defensive-read error surface.

Mirrors the reference's read error contract (reference src/read.zig:22-31):
reads of hostile/corrupt input must fail cleanly with a typed error, never
crash the process.
"""


class OliveError(Exception):
    """Base class for all olive format errors."""


class DataSectionTooSmall(OliveError):
    """A page points past the end of the data section."""


class DecompressFail(OliveError):
    """A page failed to decompress or decompressed to the wrong size."""


class UnexpectedArrayType(OliveError):
    """Header physical tag disagrees with the schema's logical type."""


class LengthMismatch(OliveError):
    """Buffer/child lengths are inconsistent with the declared array length."""


class BufferTooBig(OliveError):
    """A buffer exceeds the format's defensive size limits."""


class ValidationError(OliveError):
    """Schema or header failed structural validation."""


class InvalidBufferLen(OliveError):
    """A raw buffer's byte length is not what the type requires."""


class DataSectionOverflow(OliveError):
    """Write-side: chunk data section would exceed the 4 GiB cap
    (reference src/write.zig:986-991)."""


class SerializableConflict(OliveError):
    """Opt-in Serializable isolation (ops.maintenance mutations with
    ``isolation="serializable"``): a concurrent append committed rows
    intersecting the mutation's predicate between its snapshot read
    and its commit — the mutation aborts with nothing made visible;
    re-run it to read the new rows."""
