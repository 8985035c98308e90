"""DataX-style JSON job configuration.

Keeps the reference's job format as the pipeline-spec language
(/root/reference/common/config/configuration.go:35-287 dot-path config;
job shape per /root/reference/test-data/*.json):

    {"job": {"setting": {"speed": {"channel": N},
                         "errorLimit": {"record": n, "percentage": p}},
             "content": [{"reader": {"name": ..., "parameter": {...}},
                          "transformer": [...],
                          "writer": {"name": ..., "parameter": {...}}}]}}

Also provides the Go reference-time layout -> strftime converter used by
every date format in configs (Go layouts like "2006-01-02 15:04:05",
/root/reference/plugins/reader/txtfilereader/txtfile_reader.go:468-475).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

# Ordered longest-first so e.g. "2006" wins over "06", "15" over "1".
_GO_TOKENS = [
    ("2006", "%Y"),
    ("January", "%B"),
    ("Monday", "%A"),
    ("Jan", "%b"),
    ("Mon", "%a"),
    (".000000", ".%f"),
    (".000", ".%f"),
    ("15", "%H"),
    ("01", "%m"),
    ("02", "%d"),
    ("03", "%I"),
    ("04", "%M"),
    ("05", "%S"),
    ("06", "%y"),
    ("-0700", "%z"),
    ("Z07:00", "%z"),
    ("PM", "%p"),
    ("pm", "%p"),
    ("MST", "%Z"),
]


def go_layout_to_strftime(layout: str) -> str:
    """Convert a Go reference-time layout to a strftime format string."""
    out = []
    i = 0
    n = len(layout)
    while i < n:
        for tok, rep in _GO_TOKENS:
            if layout.startswith(tok, i):
                out.append(rep)
                i += len(tok)
                break
        else:
            out.append(layout[i])
            i += 1
    return "".join(out)


# The reader's fallback date formats, in order
# (txtfile_reader.go:468-475).
GO_DATE_FALLBACKS = [
    "2006-01-02 15:04:05",
    "2006-01-02",
    "2006/01/02 15:04:05",
    "2006/01/02",
    "01/02/2006 15:04:05",
    "01/02/2006",
]
STRFTIME_DATE_FALLBACKS = [go_layout_to_strftime(f) for f in GO_DATE_FALLBACKS]

# RFC3339-ish fallbacks used by the JSON reader
# (jsonfile_reader.go:1100-1140 date parsing).
JSON_DATE_FALLBACKS = STRFTIME_DATE_FALLBACKS + [
    "%Y-%m-%dT%H:%M:%SZ",
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S.%fZ",
    "%Y-%m-%dT%H:%M:%S",
]


class Configuration:
    """Dot-path JSON config accessors, mirroring the reference's
    Configuration (common/config/configuration.go:35-287): typed get with
    defaults, dot-path set with intermediate-map creation, clone via
    round-trip."""

    def __init__(self, data: dict[str, Any] | None = None):
        self.data: dict[str, Any] = data if data is not None else {}

    @classmethod
    def from_file(cls, path: str) -> "Configuration":
        with open(path) as f:
            return cls(json.load(f))

    def _walk(self, path: str, create: bool = False):
        parts = path.split(".")
        cur = self.data
        for p in parts[:-1]:
            if isinstance(cur, list):
                cur = cur[int(p)]
                continue
            if p not in cur or not isinstance(cur[p], (dict, list)):
                if not create:
                    return None, None
                cur[p] = {}
            cur = cur[p]
        return cur, parts[-1]

    def get(self, path: str, default: Any = None) -> Any:
        cur, leaf = self._walk(path)
        if cur is None:
            return default
        if isinstance(cur, list):
            try:
                return cur[int(leaf)]
            except (ValueError, IndexError):
                return default
        return cur.get(leaf, default)

    def get_string(self, path: str, default: str = "") -> str:
        v = self.get(path, default)
        return default if v is None else str(v)

    def get_int(self, path: str, default: int = 0) -> int:
        v = self.get(path, default)
        try:
            return int(v)
        except (TypeError, ValueError):
            return default

    def get_float(self, path: str, default: float = 0.0) -> float:
        v = self.get(path, default)
        try:
            return float(v)
        except (TypeError, ValueError):
            return default

    def get_bool(self, path: str, default: bool = False) -> bool:
        v = self.get(path, default)
        if isinstance(v, bool):
            return v
        return str(v).lower() in ("1", "t", "true")

    def set(self, path: str, value: Any) -> None:
        cur, leaf = self._walk(path, create=True)
        if isinstance(cur, list):
            cur[int(leaf)] = value
        else:
            cur[leaf] = value

    def clone(self) -> "Configuration":
        return Configuration(json.loads(json.dumps(self.data)))


@dataclass
class JobConfig:
    """Parsed DataX job JSON."""

    reader_name: str
    reader_param: dict[str, Any]
    writer_name: str
    writer_param: dict[str, Any]
    transformers: list[dict[str, Any]] = field(default_factory=list)
    channel: int = 1
    speed_record: int | None = None  # max records/sec (ENFORCED, unlike ref)
    speed_byte: int | None = None  # max bytes/sec (ENFORCED, unlike ref)
    error_limit_record: int | None = None
    error_limit_percentage: float | None = None
    raw: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any],
                  variables: dict[str, str] | None = None) -> "JobConfig":
        d = substitute_variables(d, variables)
        job = d["job"]
        content = job["content"][0]  # reference supports exactly one content
        setting = job.get("setting", {})
        speed = setting.get("speed", {})
        el = setting.get("errorLimit", {})
        return cls(
            reader_name=content["reader"]["name"],
            reader_param=content["reader"].get("parameter", {}),
            writer_name=content["writer"]["name"],
            writer_param=content["writer"].get("parameter", {}),
            transformers=content.get("transformer", []),
            channel=int(speed.get("channel", 1)),
            # ${var} substitution stringifies values, so speed.record may
            # arrive as "10000" — coerce before comparing.
            speed_record=(lambda v: int(v) if int(v) > 0 else None)(
                speed.get("record", -1) or -1),
            speed_byte=(lambda v: int(v) if int(v) > 0 else None)(
                speed.get("byte", -1) or -1),
            error_limit_record=el.get("record"),
            error_limit_percentage=el.get("percentage"),
            raw=d,
        )

    @classmethod
    def from_file(cls, path: str,
                  variables: dict[str, str] | None = None) -> "JobConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f), variables=variables)


_VAR_RE = __import__("re").compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def substitute_variables(obj: Any, variables: dict[str, str] | None = None) -> Any:
    """Recursive ``${name}`` substitution over a job config.

    The reference DOCUMENTS this for incremental syncs
    (docs/USER_GUIDE.md:47-58, ``"where": "id > ${lastMaxId}"``) but
    never implements it; here it is real: explicit ``variables`` win,
    then environment variables. An unresolved reference raises — a
    half-substituted WHERE clause silently syncing everything is the
    incremental-job failure mode this prevents."""
    import os

    def sub(v: Any) -> Any:
        if isinstance(v, str):
            def repl(m):
                name = m.group(1)
                if variables and name in variables:
                    return str(variables[name])
                if name in os.environ:
                    return os.environ[name]
                raise KeyError(
                    f"job config references ${{{name}}} but no such variable "
                    "was supplied (CLI -p / variables dict / environment)"
                )
            return _VAR_RE.sub(repl, v)
        if isinstance(v, dict):
            return {k: sub(x) for k, x in v.items()}
        if isinstance(v, list):
            return [sub(x) for x in v]
        return v

    return sub(obj)
