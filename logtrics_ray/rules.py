"""Declarative extraction rules — the reimagined logtrics{} Lua constructor.

A reference rule is ``logtrics{ name=, parser={type="re2", expression=},
handler=fn, ... }`` (/root/reference/script.go:66-75 registering,
/root/reference/logtrics.go:31-69 parsing).  The handler's effect in
every real script is "extract value(s) from the named capture groups,
emit metric points" via the graphite() API
(/root/reference/logtrics.go:270-285, graphite/graphite.go:101-151).

We make that effect declarative so it can run vectorized over Arrow
batches: each rule = one RE2 expression (named capture groups only are
kept, matching /root/reference/parser.go:51-53) + a list of emits, each
naming a metric type, a series-key template over the capture groups, and
a value expression.  Validation is strict like the reference's config
merge: unknown keys are a hard error (/root/reference/logtrics.go:100-101),
a missing name/expression is fatal (/root/reference/logtrics.go:32-45).

An optional per-row Python callable (``handler``) is kept as the escape
hatch for arbitrary logic, mirroring the Lua handler — it is the slow
path and documented as such.
"""

from __future__ import annotations

import logging
import os
import re
from dataclasses import dataclass, field
from typing import Callable


def configure_logging(kind: str = "console", level: str = "info") -> logging.Logger:
    """Application logger factory — the reimagined ``Configuration.Logger``
    (/root/reference/config/config.go:63-76): ``type = "syslog"`` wires a
    stdlib ``SysLogHandler`` (local /dev/log, falling back to UDP
    localhost:514 when the socket is absent, as in this sandbox), anything
    else a timestamped stderr console writer; the level string maps like
    the reference's ``lvlMap``.  Returns the configured ``logtrics``
    parent logger that every ``RuleLogger`` chains to."""
    root = logging.getLogger("logtrics")
    root.handlers.clear()
    if kind == "syslog":
        from logging.handlers import SysLogHandler
        try:
            h = SysLogHandler(address="/dev/log")
        except OSError:
            h = SysLogHandler()       # UDP localhost:514 fallback
        h.setFormatter(logging.Formatter("logtrics_ray: %(name)s %(message)s"))
    else:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(name)s %(message)s",
            datefmt="%Y-%m-%dT%H:%M:%S"))
    root.addHandler(h)
    lvl = {"trace": logging.DEBUG, "debug": logging.DEBUG,
           "info": logging.INFO, "warn": logging.WARNING,
           "error": logging.ERROR, "fatal": logging.CRITICAL}.get(
               level.lower(), logging.INFO)
    root.setLevel(lvl)
    return root


class RuleLogger:
    """Per-rule logging API handed to handler UDFs — the reimagined
    ``fatal/error/warn/info/debug/trace`` bindings the reference injects
    into every Lua script state tagged ``script:[name]``
    (/root/reference/logtrics.go:162-173,204-267).

    Each method logs through the ``logtrics.rule.<name>`` logger with the
    ``script:[name]`` prefix; ``fatal`` raises (the reference's
    ``log.Fatal`` exits the process — in a batch engine that's an error
    surfaced through the per-rule error counter instead of a worker
    kill)."""

    __slots__ = ("name", "_log")

    def __init__(self, name: str):
        self.name = name
        self._log = logging.getLogger(f"logtrics.rule.{name}")

    def _fmt(self, msg: str, args) -> str:
        return f"script:[{self.name}] " + (msg % args if args else msg)

    def trace(self, msg, *args):
        self._log.debug(self._fmt(msg, args))

    def debug(self, msg, *args):
        self._log.debug(self._fmt(msg, args))

    def info(self, msg, *args):
        self._log.info(self._fmt(msg, args))

    def warn(self, msg, *args):
        self._log.warning(self._fmt(msg, args))

    def error(self, msg, *args):
        self._log.error(self._fmt(msg, args))

    def fatal(self, msg, *args):
        text = self._fmt(msg, args)
        self._log.error(text)
        raise RuleFatal(text)


class RuleFatal(RuntimeError):
    """Raised by RuleLogger.fatal inside a handler; counted per rule by
    the extractor (log-and-continue, /root/reference/script.go:58-61)."""

METRIC_TYPES = ("counter", "gauge", "timer", "meter")

_RULE_KEYS = {"name", "expression", "emit", "handler", "gap_fill", "tiers"}
_EMIT_KEYS = {"metric_type", "series", "value"}

# value expressions: ("const", x) | ("cast", group) | ("len", group)
_VALUE_RE = re.compile(r"^(?:(?P<const>-?\d+(?:\.\d+)?)|len\((?P<len>\w+)\)|float\((?P<cast>\w+)\))$")

_TEMPLATE_FIELD = re.compile(r"\{(\w+)\}")


@dataclass(frozen=True)
class EmitSpec:
    metric_type: str            # counter | gauge | timer | meter
    series: str                 # template, e.g. "lt.hello.{first}"; may use {_source}
    value: tuple                # ("const", float) | ("cast", group) | ("len", group)

    @property
    def template_fields(self) -> list[str]:
        return _TEMPLATE_FIELD.findall(self.series)


@dataclass(frozen=True)
class RuleSpec:
    name: str
    expression: str             # RE2-compatible regex with named groups
    emits: tuple[EmitSpec, ...]
    handler: Callable | None = None   # optional per-row escape hatch (slow path)

    @property
    def group_names(self) -> list[str]:
        """Named capture groups — the rule's output schema, inferred from the
        regex exactly like regexp.SubexpNames() at /root/reference/parser.go:46."""
        return list(re.compile(self.expression).groupindex)


def _parse_value(spec) -> tuple:
    if isinstance(spec, (int, float)):
        return ("const", float(spec))
    m = _VALUE_RE.match(str(spec))
    if not m:
        raise ValueError(
            f"bad value expression {spec!r}: expected a number, len(<group>) or float(<group>)")
    if m.group("const") is not None:
        return ("const", float(m.group("const")))
    if m.group("len") is not None:
        return ("len", m.group("len"))
    return ("cast", m.group("cast"))


def _build_rule(d: dict) -> RuleSpec:
    unknown = set(d) - _RULE_KEYS
    if unknown:
        # Strict like the reference's mergeConfig: unknown keys are fatal
        # (/root/reference/logtrics.go:100-101).
        raise ValueError(f"rule {d.get('name', '?')!r}: unknown keys {sorted(unknown)}")
    if "name" not in d:
        raise ValueError("rule missing required 'name' (/root/reference/logtrics.go:32-35)")
    if "expression" not in d:
        raise ValueError(f"rule {d['name']!r} missing 'expression' (/root/reference/logtrics.go:37-45)")
    try:
        cre = re.compile(d["expression"])
    except re.error as e:
        raise ValueError(f"rule {d['name']!r}: bad regex: {e}") from e
    emits = []
    for e in d.get("emit", []):
        unknown = set(e) - _EMIT_KEYS
        if unknown:
            raise ValueError(f"rule {d['name']!r}: unknown emit keys {sorted(unknown)}")
        mt = e["metric_type"]
        if mt not in METRIC_TYPES:
            raise ValueError(f"rule {d['name']!r}: metric_type must be one of {METRIC_TYPES}")
        spec = EmitSpec(metric_type=mt, series=e["series"], value=_parse_value(e["value"]))
        groups = set(cre.groupindex) | {"_source"}
        for f in spec.template_fields:
            if f not in groups:
                raise ValueError(
                    f"rule {d['name']!r}: series template field {{{f}}} is not a capture group")
        for kind, arg in [spec.value[:2]] if spec.value[0] != "const" else []:
            if arg not in cre.groupindex:
                raise ValueError(f"rule {d['name']!r}: value group {arg!r} is not a capture group")
        emits.append(spec)
    if not emits and d.get("handler") is None:
        raise ValueError(
            f"rule {d['name']!r}: needs at least one emit or a handler "
            "(/root/reference/logtrics.go:47-51: missing handler is fatal)")
    return RuleSpec(name=d["name"], expression=d["expression"], emits=tuple(emits),
                    handler=d.get("handler"))


def load_rules(spec: list[dict] | str) -> tuple[RuleSpec, ...]:
    """Load rules from a list of dicts, a TOML file ([[rule]] array), or a
    DIRECTORY of ``*.toml`` files (walked in sorted order, all rules
    concatenated — ≙ the reference's script-dir discovery where every
    ``*.lua`` in ``scriptdir`` is loaded and every event is offered to
    every rule of every script, /root/reference/app.go:96-111).

    Duplicate rule names across files are fatal (strict like the
    reference's config merge, /root/reference/logtrics.go:100-101)."""
    if isinstance(spec, str) and os.path.isdir(spec):
        files = sorted(f for f in os.listdir(spec)
                       if f.endswith((".toml", ".lua")))
        if not files:
            raise ValueError(
                f"rules dir {spec!r} contains no *.toml or *.lua files")
        rules: list[RuleSpec] = []
        seen: dict[str, str] = {}
        for f in files:
            for r in load_rules(os.path.join(spec, f)):
                if r.name in seen:
                    raise ValueError(
                        f"duplicate rule name {r.name!r}: defined in "
                        f"{seen[r.name]!r} and {f!r}")
                seen[r.name] = f
                rules.append(r)
        return tuple(rules)
    if isinstance(spec, str) and spec.endswith(".lua"):
        # reference scripts unchanged (script.go:23-36 evals *.lua)
        from logtrics_ray.luacompat import load_lua_rules
        return load_lua_rules(spec)
    if isinstance(spec, str):
        import tomllib
        with open(spec, "rb") as f:
            data = tomllib.load(f)
        spec = data.get("rule", [])
    return tuple(_build_rule(d) for d in spec)


def default_rules() -> tuple[RuleSpec, ...]:
    """The fixture rule corpus (FIXTURES.md F2): all four metric types, a
    non-matching rule (drop path, /root/reference/logtrics.go:184-188), a
    single hot series (skew), and a multi-emit rule
    (fan-out, /root/reference/app.go:80-82)."""
    return load_rules([
        {
            "name": "hello-gauge",
            "expression": r'hello "(?P<first>[a-zA-Z0-9]+)"',
            "emit": [{"metric_type": "gauge", "series": "lt.hello.{first}",
                      "value": "len(first)"}],
        },
        {
            "name": "latency-timer",
            "expression": r"latency_ms=(?P<ms>\d+)",
            "emit": [{"metric_type": "timer", "series": "lt.latency.{_source}",
                      "value": "float(ms)"}],
        },
        {
            "name": "req-counter",
            "expression": r"GET /api/(?P<ep>[a-z]+)",
            "emit": [{"metric_type": "counter", "series": "lt.req.{ep}", "value": 1}],
        },
        {
            "name": "bytes-meter",  # single hot series -> exercises salting
            "expression": r"bytes=(?P<b>\d+)",
            "emit": [{"metric_type": "meter", "series": "lt.bytes.total",
                      "value": "float(b)"}],
        },
        {
            "name": "never-matches",
            "expression": r"zz_never_matches_(?P<x>\d+)",
            "emit": [{"metric_type": "counter", "series": "lt.never.{x}", "value": 1}],
        },
        {
            "name": "status-multi",  # two emits per match
            "expression": r"status=(?P<code>\d{3})",
            "emit": [
                {"metric_type": "counter", "series": "lt.status.{code}", "value": 1},
                {"metric_type": "meter", "series": "lt.status.all", "value": 1},
            ],
        },
    ])
