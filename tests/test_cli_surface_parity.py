"""CLI flag-surface parity pinned against the LIVE reference.

Walks both click command trees and asserts every reference command and
every reference option spelling exists on our side (reference
``src/jaeger/cli.py``) — so a user switching over can reuse their
command lines verbatim. Intentional surface extensions on our side
(predict-legacy as an explicit command, multi-host/mesh knobs, etc.)
are allowed; missing reference spellings are not.
"""

from __future__ import annotations

import importlib.metadata as _md
import sys
from pathlib import Path

import click
import pytest

if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")
sys.path.insert(0, str(Path(__file__).parent))

import refstubs  # noqa: E402

refstubs.install()

pytest.importorskip("tensorflow")

_version = _md.version


def _patched_version(name):
    if name == "jaeger-bio":
        return "0.0.0"
    return _version(name)


import os

_md.version = _patched_version
_xla_flags = os.environ.get("XLA_FLAGS")
try:
    # the reference cli module OVERWRITES os.environ["XLA_FLAGS"] at
    # import (cli.py:26 sets a CUDA dir) — restore ours or the suite's
    # 8-device virtual CPU mesh disappears for every later test
    ref_cli = pytest.importorskip("jaeger.cli")
finally:
    _md.version = _version
    if _xla_flags is not None:
        os.environ["XLA_FLAGS"] = _xla_flags
    else:
        os.environ.pop("XLA_FLAGS", None)

from jaeger_tpu import cli as our_cli  # noqa: E402

#: reference flags that intentionally do NOT exist here, with the reason
ALLOWED_MISSING: dict[str, set[str]] = {}


def _walk(cmd, prefix=""):
    out = {}
    if isinstance(cmd, click.Group):
        for name, sub in cmd.commands.items():
            out.update(_walk(sub, f"{prefix}{name} "))
    else:
        opts = set()
        for p in cmd.params:
            for o in getattr(p, "opts", []) + getattr(p, "secondary_opts", []):
                opts.add(o)
        out[prefix.strip()] = opts
    return out


def test_every_reference_command_and_flag_exists():
    ref = _walk(ref_cli.main)
    ours = _walk(our_cli.main)
    problems = []
    for cmd, flags in sorted(ref.items()):
        if cmd not in ours:
            problems.append(f"missing command: {cmd}")
            continue
        missing = flags - ours[cmd] - ALLOWED_MISSING.get(cmd, set())
        missing -= {"--help", "-h"}
        if missing:
            problems.append(f"{cmd}: missing flags {sorted(missing)}")
    assert not problems, "\n".join(problems)


def test_predict_defaults_match_reference():
    """The numeric defaults a switching user inherits silently."""
    ref = {p.name: p.default
           for p in ref_cli.main.commands["predict"].params}
    ours = {p.name: p.default
            for p in our_cli.main.commands["predict"].params}
    for key, ref_name in (("fsize", "fsize"), ("stride", "stride"),
                          ("batch", "batch"), ("lc", "lc"),
                          ("sensitivity", "sensitivity")):
        assert ours[key] == ref[ref_name], key
    assert ours["reliability_cutoff"] == ref["rc"]
    assert ours["phage_score"] == ref["pc"]
    assert ours["crf_switch_cost"] == ref["crf_switch_cost"]
    # documented divergence: our precision default is bf16 (TPU), ref fp32
    assert ref["precision"] == "fp32" and ours["precision"] == "bfloat16"
