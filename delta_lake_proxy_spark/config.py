"""Engine configuration.

Shape mirrors the reference proxy's JSON config (reference ``src/config.rs:6-26``,
``config.json``): ``tableMapping`` (alias -> physical table location),
``allowedPartitions`` (alias -> DNF list of partition-equality maps),
``readOnly`` (default true, ref ``src/config.rs:36-38``), plus env-var
overrides with the ``PROXY_`` prefix (ref ``src/main.rs:55-59``).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

# DNF: list of AND-maps, OR across the list (ref src/config.rs:17).
PartitionDNF = list[dict[str, str]]

_TRUTHY = {"1", "true", "yes", "on"}


@dataclass
class EngineConfig:
    """Configuration for :class:`~delta_lake_proxy_spark.engine.Engine`."""

    table_mapping: dict[str, str] = field(default_factory=dict)
    allowed_partitions: dict[str, PartitionDNF] = field(default_factory=dict)
    read_only: bool = True
    # Cache sizing mirrors the reference's operational constants
    # (snapshot cache 20x120s src/main.rs:82-85; ACL caches 100x120s
    # src/main.rs:90-93, src/database.rs:28-32).
    acl_cache_size: int = 100
    acl_cache_ttl_s: float = 120.0
    # Delta-style checkpoint cadence for engine writes (0 disables).
    checkpoint_interval: int = 10
    # Log-compaction cadence (Delta spec "Log Compaction Files", 0 = off):
    # every N commits NOT already covered by a fresh checkpoint, write
    # ``<x>.<y>.compacted.json`` so replays read one file per N-commit run.
    # Useful when the checkpoint interval is long relative to commit rate
    # (high-frequency streaming appends).
    log_compaction_interval: int = 0

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "EngineConfig":
        """Accept both camelCase (reference JSON shape) and snake_case keys."""

        def pick(*names: str, default: Any = None) -> Any:
            for n in names:
                if n in d:
                    return d[n]
            return default

        allowed_raw = pick("allowedPartitions", "allowed_partitions", default={}) or {}
        allowed = {
            table: [{str(k): str(v) for k, v in m.items()} for m in dnf]
            for table, dnf in allowed_raw.items()
        }
        return cls(
            table_mapping=dict(pick("tableMapping", "table_mapping", default={}) or {}),
            allowed_partitions=allowed,
            read_only=bool(pick("readOnly", "read_only", default=True)),
            acl_cache_size=int(pick("aclCacheSize", "acl_cache_size", default=100)),
            acl_cache_ttl_s=float(pick("aclCacheTtlS", "acl_cache_ttl_s", default=120.0)),
            checkpoint_interval=int(
                pick("checkpointInterval", "checkpoint_interval", default=10)
            ),
            log_compaction_interval=int(
                pick("logCompactionInterval", "log_compaction_interval", default=0)
            ),
        )

    @classmethod
    def from_json(cls, path: str) -> "EngineConfig":
        with open(path, "r", encoding="utf-8") as f:
            return cls.from_dict(json.load(f))

    def apply_env(self, environ: dict[str, str] | None = None) -> "EngineConfig":
        """Apply ``PROXY_``-prefixed env overrides (ref ``src/main.rs:57``).

        Supported: ``PROXY_READONLY`` (bool), ``PROXY_TABLEMAPPING`` /
        ``PROXY_ALLOWEDPARTITIONS`` (JSON strings).
        """
        env = os.environ if environ is None else environ
        if "PROXY_READONLY" in env:
            self.read_only = env["PROXY_READONLY"].strip().lower() in _TRUTHY
        if "PROXY_TABLEMAPPING" in env:
            self.table_mapping.update(json.loads(env["PROXY_TABLEMAPPING"]))
        if "PROXY_ALLOWEDPARTITIONS" in env:
            parsed = json.loads(env["PROXY_ALLOWEDPARTITIONS"])
            for table, dnf in parsed.items():
                self.allowed_partitions[table] = [
                    {str(k): str(v) for k, v in m.items()} for m in dnf
                ]
        return self
