"""PySpark-native governed Delta lakehouse engine.

A from-scratch rebuild of the semantics of ``bnouvelbmll/delta-lake-proxy``
(a Rust S3-emulating governed Delta proxy) as an idiomatic Spark library,
extended with LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis). See SURVEY.md for the full blueprint.
"""

from .acl import ANONYMOUS, compile_dnf, dnf_to_sql, extension_confs, extract_user
from .config import EngineConfig
from .engine import Engine, write_governed_table
from .errors import (
    EngineError,
    ForbiddenByPolicyError,
    NoSuchKeyError,
    ReadOnlyError,
    TableNotFoundError,
    UnsupportedProtocolError,
)
from .session import build_session, ensure_engine_confs

__all__ = [
    "ANONYMOUS",
    "Engine",
    "EngineConfig",
    "EngineError",
    "ForbiddenByPolicyError",
    "NoSuchKeyError",
    "ReadOnlyError",
    "TableNotFoundError",
    "UnsupportedProtocolError",
    "build_session",
    "compile_dnf",
    "dnf_to_sql",
    "ensure_engine_confs",
    "extension_confs",
    "extract_user",
    "write_governed_table",
]

__version__ = "0.1.0"
