"""Engine configuration: YAML with ${VAR:default} env substitution and
dotted-key access (src/utils/config.py:21-87 semantics), plus the mapping
from config keys to SparkSession settings.

Same contract as the reference: substitution happens on the raw text before
parsing (so env values can be any YAML scalar), missing vars fall back to the
default after the colon or empty string, and `get("a.b.c", default)` walks
nested dicts.
"""

from __future__ import annotations

import os
import re
from typing import Any

_ENV_PATTERN = re.compile(r"\$\{([^}:]+)(?::([^}]*))?\}")


def substitute_env_vars(content: str, env: dict | None = None) -> str:
    lookup = env if env is not None else os.environ

    def repl(match: re.Match) -> str:
        default = match.group(2) if match.group(2) is not None else ""
        return lookup.get(match.group(1), default)

    return _ENV_PATTERN.sub(repl, content)


class EngineConfig:
    def __init__(self, config: dict | None = None):
        self.config: dict = config or {}

    @classmethod
    def load(cls, path: str, env: dict | None = None) -> "EngineConfig":
        import yaml

        with open(path, encoding="utf-8") as f:
            content = substitute_env_vars(f.read(), env)
        return cls(yaml.safe_load(content) or {})

    @classmethod
    def from_string(cls, content: str, env: dict | None = None) -> "EngineConfig":
        import yaml

        return cls(yaml.safe_load(substitute_env_vars(content, env)) or {})

    def get(self, key: str, default: Any = None) -> Any:
        value: Any = self.config
        for part in key.split("."):
            if not isinstance(value, dict) or part not in value:
                return default
            value = value[part]
        return value

    def spark_conf(self) -> dict[str, str]:
        """Engine-relevant keys → Spark settings (the reference's
        `processing`/`performance` block analogue)."""
        out: dict[str, str] = {}
        if (v := self.get("spark.shuffle_partitions")) is not None:
            out["spark.sql.shuffle.partitions"] = str(v)
        if (v := self.get("spark.broadcast_threshold_mb")) is not None:
            out["spark.sql.autoBroadcastJoinThreshold"] = str(int(v) * 1024 * 1024)
        if (v := self.get("spark.max_partition_bytes_mb")) is not None:
            out["spark.sql.files.maxPartitionBytes"] = str(int(v) * 1024 * 1024)
        if (v := self.get("spark.aqe")) is not None:
            out["spark.sql.adaptive.enabled"] = str(bool(v)).lower()
        return out
