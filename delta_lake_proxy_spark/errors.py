"""Typed engine errors.

Mirrors the reference proxy's HTTP error mapping (reference
``src/main.rs:770-788``, ``src/main.rs:503-512``, ``src/main.rs:1137-1173``):
unknown alias -> 404, missing object -> 404 NoSuchKey, partition-ACL denial ->
403, writes in read-only mode -> 403/405. The engine raises typed exceptions
instead of HTTP statuses.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for all governed-engine errors."""

    status = 500


class TableNotFoundError(EngineError):
    """Alias not present in the table mapping (ref ``src/main.rs:503-512``)."""

    status = 404

    def __init__(self, alias: str):
        super().__init__(f"no table mapping found for alias '{alias}'")
        self.alias = alias


class NoSuchKeyError(EngineError):
    """Requested object/file does not exist (ref ``src/main.rs:770-788``)."""

    status = 404

    def __init__(self, key: str):
        super().__init__(f"no such key: '{key}'")
        self.key = key


class ForbiddenByPolicyError(EngineError):
    """Partition ACL denies access (ref ``src/main.rs:576-594``)."""

    status = 403

    def __init__(self, user: str, alias: str, detail: str = ""):
        msg = f"access to table '{alias}' denied for user '{user}' by partition policy"
        if detail:
            msg += f": {detail}"
        super().__init__(msg)
        self.user = user
        self.alias = alias


class UnsupportedProtocolError(EngineError):
    """The table's Delta protocol demands a reader/writer capability this
    engine does not implement (column mapping, deletion vectors, any table
    feature). Mirrors the reference's delegated behavior: ``deltalake::
    open_table`` (ref ``src/main.rs:357``) refuses tables whose
    ``protocol.minReaderVersion`` it cannot honor. Failing loudly here is a
    CORRECTNESS guarantee — replaying a reader-3 log as if it were reader-1
    would silently resurrect DV-deleted rows or serve physical column names.
    """

    status = 500

    def __init__(self, table_path: str, detail: str):
        super().__init__(
            f"unsupported Delta protocol at '{table_path}': {detail}"
        )
        self.table_path = table_path


class ReadOnlyError(EngineError):
    """Write attempted while the engine is read-only (ref ``src/main.rs:941-948``)."""

    status = 403

    def __init__(self, alias: str):
        super().__init__(f"engine is read-only; refusing write to '{alias}'")
        self.alias = alias
