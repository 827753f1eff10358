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
from dataclasses import dataclass
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
    root.setLevel(LEVELS.get(level.lower(), logging.INFO))
    return root


#: the reference's lvlMap (config/config.go) — shared by the global
#: configure_logging and per-rule logging{level=} overrides
LEVELS = {"trace": logging.DEBUG, "debug": logging.DEBUG,
          "info": logging.INFO, "warn": logging.WARNING,
          "error": logging.ERROR, "fatal": logging.CRITICAL}


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

    def __init__(self, name: str, level: str | None = None):
        self.name = name
        self._log = logging.getLogger(f"logtrics.rule.{name}")
        if level is not None:
            # per-rule logging{level=} override (logtrics.go:91-96);
            # the rule's logger overrides the global level for its rows
            self._log.setLevel(LEVELS.get(str(level).lower(), logging.INFO))

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

_RULE_KEYS = {"name", "expression", "emit", "handler", "gap_fill", "tiers",
              "graphite", "logging"}
_EMIT_KEYS = {"metric_type", "series", "value"}

# Keys the reference REJECTS BY NAME at the rule level with
# "modification is not supported" (/root/reference/logtrics.go:98-99).
# The reference's literal list spells "sctriptfile" (its typo); accept
# the intended spelling too so neither form slips through as unknown.
_FORBIDDEN_RULE_KEYS = {"sctriptfile", "scriptfile", "scriptdir",
                        "mode", "tcp", "udp"}

# Per-rule graphite override subkeys (/root/reference/logtrics.go:107-137
# updateGraphiteConfig); unknown subkeys are silently ignored there (no
# default case) — mirrored here.  ``interval`` is the flush cadence in
# SECONDS ≙ this engine's smallest-tier window width.
_GRAPHITE_KEYS = {"host", "port", "interval", "debug"}
# Per-rule logging override subkeys (logtrics.go:138-158 updateLogConfig);
# unknown subkeys are FATAL there ("invalid logging config") — mirrored.
_LOGGING_KEYS = {"type", "level"}

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
    # per-rule sink/logging overrides, stored as sorted item tuples so the
    # frozen spec stays hashable (RuleSpec tuples key the per-process
    # extractor cache); reference: logtrics.go:86-97 merges a rule's
    # graphite{}/logging{} tables over the global config
    graphite: tuple = ()
    logging_conf: tuple = ()

    @property
    def group_names(self) -> list[str]:
        """Named capture groups — the rule's output schema, inferred from the
        regex exactly like regexp.SubexpNames() at /root/reference/parser.go:46."""
        return list(re.compile(self.expression).groupindex)

    @property
    def graphite_conf(self) -> dict:
        return dict(self.graphite)

    @property
    def window_ms(self) -> int | None:
        """Per-rule smallest-tier window width in ms, from the graphite
        ``interval`` override (seconds, ≙ the reference's per-rule flush
        cadence /root/reference/logtrics.go:125-129); None = engine
        default."""
        iv = dict(self.graphite).get("interval")
        return int(iv) * 1000 if iv is not None else None


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


def _parse_graphite(name: str, g) -> tuple:
    """Per-rule graphite override table -> sorted item tuple.  Mirrors
    updateGraphiteConfig (/root/reference/logtrics.go:107-137): known
    subkeys coerced (port/interval int, debug bool), unknown subkeys
    silently ignored (the reference switch has no default case)."""
    if not isinstance(g, dict):
        raise ValueError(
            f"rule {name!r}: invalid graphite configuration "
            "(/root/reference/logtrics.go:109-110)")
    out = {}
    for k, v in g.items():
        if k not in _GRAPHITE_KEYS:
            continue
        try:
            if k in ("port", "interval"):
                v = int(v)
                if k == "interval" and v <= 0:
                    raise ValueError
            elif k == "debug":
                v = (v if isinstance(v, bool)
                     else str(v).lower() in ("1", "true", "yes"))
            else:
                v = str(v)
        except (TypeError, ValueError):
            raise ValueError(
                f"rule {name!r}: bad graphite.{k} value {v!r}") from None
        out[k] = v
    return tuple(sorted(out.items()))


def _parse_logging(name: str, lg) -> tuple:
    """Per-rule logging override -> sorted item tuple.  Mirrors
    updateLogConfig (/root/reference/logtrics.go:138-158): unknown
    subkeys are FATAL ("invalid logging config")."""
    if not isinstance(lg, dict):
        raise ValueError(
            f"rule {name!r}: invalid logging configuration "
            "(/root/reference/logtrics.go:140-142)")
    unknown = set(lg) - _LOGGING_KEYS
    if unknown:
        raise ValueError(
            f"rule {name!r}: invalid logging config — unknown keys "
            f"{sorted(unknown)} (/root/reference/logtrics.go:152-155)")
    return tuple(sorted((k, str(v)) for k, v in lg.items()))


def _build_rule(d: dict) -> RuleSpec:
    forbidden = set(d) & _FORBIDDEN_RULE_KEYS
    if forbidden:
        # the reference's exact posture for these keys: not "unknown",
        # but explicitly unmodifiable (/root/reference/logtrics.go:98-99)
        raise ValueError(
            f"rule {d.get('name', '?')!r}: modification is not supported "
            f"for [{sorted(forbidden)[0]}]")
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
                    handler=d.get("handler"),
                    graphite=_parse_graphite(d["name"], d["graphite"])
                    if "graphite" in d else (),
                    logging_conf=_parse_logging(d["name"], d["logging"])
                    if "logging" in d else ())


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
