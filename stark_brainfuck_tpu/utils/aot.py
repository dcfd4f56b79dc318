"""AOT-exported executable cache: cross-process reuse of traced stages.

Profiling on the TPU box (2 cores) showed prover warmup is dominated by
*Python re-tracing* of the jitted stages (~140 s/process at 2^12) plus
XLA compiles (~150 s cold; ~0 warm via the persistent compilation
cache). The persistent cache cannot remove tracing — every fresh
`python bench.py` pays it again. This module does: each top-level stage
is exported once (`jax.export`), its StableHLO serialized to disk keyed
by (stage name, code hash, backend, abstract input signature); later
processes deserialize and call — no Python tracing of the stage body,
and the embedded module hashes to the same XLA executable so the
persistent compile cache still applies downstream.

Usage: `aot_jit(name, fn)` is a drop-in for `jax.jit(fn)` for functions
of array-pytree arguments (no static argnums — bind statics with
functools.partial and fold their values into `name`). Calls made while
another trace is active, or when STARK_NO_AOT is set, fall through to
plain jit. Any export/deserialize failure falls back to jit silently
(the cache is an optimization, never a correctness dependency).

Cache location: $STARK_AOT_CACHE or <repo>/.jax_cache/aot.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, Optional, Tuple

_CODE_HASH: Optional[str] = None
_DIR: Optional[str] = None
_DISABLED: Optional[bool] = None
_REGISTERED = False


def _register_serializations():
    """NamedTuple pytree types that appear in stage signatures must be
    registered with jax.export before serialization."""
    global _REGISTERED
    if _REGISTERED:
        return
    _REGISTERED = True
    from jax import export as jexport

    from ..ops.ntt import FourStepPack, TwiddlePack

    for cls in (TwiddlePack, FourStepPack):
        try:
            jexport.register_namedtuple_serialization(
                cls, serialized_name=f"stark_brainfuck_tpu.{cls.__name__}"
            )
        except Exception:
            pass  # already registered
    try:
        from ..ops.pallas_ntt import PallasNttPlan, SubLevel, SubPlan

        for cls in (PallasNttPlan, SubLevel, SubPlan):
            try:
                jexport.register_namedtuple_serialization(
                    cls,
                    serialized_name=f"stark_brainfuck_tpu.{cls.__name__}",
                )
            except Exception:
                pass
    except ImportError:
        pass


def _disabled() -> bool:
    global _DISABLED
    if _DISABLED is None:
        _DISABLED = bool(os.environ.get("STARK_NO_AOT"))
    return _DISABLED


def _cache_dir() -> str:
    global _DIR
    if _DIR is None:
        _DIR = os.environ.get("STARK_AOT_CACHE") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache", "aot",
        )
        os.makedirs(_DIR, exist_ok=True)
    return _DIR


def _code_hash() -> str:
    """Content hash of every package source file — exports are invalidated
    by ANY package edit (coarse but safe)."""
    global _CODE_HASH
    if _CODE_HASH is None:
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for root, _dirs, files in sorted(os.walk(pkg)):
            for fname in sorted(files):
                if fname.endswith(".py"):
                    p = os.path.join(root, fname)
                    h.update(p.encode())
                    with open(p, "rb") as fh:
                        h.update(fh.read())
        import jax

        h.update(jax.__version__.encode())
        _CODE_HASH = h.hexdigest()[:16]
    return _CODE_HASH


def _signature(args) -> str:
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(args)
    parts = [str(treedef)]
    for leaf in leaves:
        if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
            parts.append(f"{tuple(leaf.shape)}:{leaf.dtype}")
        else:
            parts.append(repr(leaf))
    return "|".join(parts)


def _key(name: str, sig: str, platform: str) -> str:
    return hashlib.sha256(
        f"{name}\x00{_code_hash()}\x00{platform}\x00{sig}".encode()
    ).hexdigest()[:32]


class _AotFn:
    """jit-compatible callable with cross-process AOT export caching."""

    def __init__(self, name: str, fn):
        self.name = name
        self.fn = fn
        self._jfn = None
        self._per_sig: Dict[str, object] = {}

    def _jit(self):
        if self._jfn is None:
            import jax

            self._jfn = jax.jit(self.fn)
        return self._jfn

    def lower(self, *args, **kwargs):
        return self._jit().lower(*args, **kwargs)

    def __call__(self, *args):
        import jax

        if _disabled():
            return self._jit()(*args)
        from jax._src import core as _core

        leaves = jax.tree_util.tree_leaves(args)
        if any(isinstance(l, _core.Tracer) for l in leaves):
            # nested under an outer trace: inline via plain jit
            return self._jit()(*args)
        sig = _signature(args)
        runner = self._per_sig.get(sig)
        if runner is None:
            runner = self._load_or_export(sig, args)
            self._per_sig[sig] = runner
        return runner(*args)

    def _load_or_export(self, sig: str, args):
        import sys
        import time

        import jax
        from jax import export as jexport

        debug = os.environ.get("STARK_AOT_DEBUG")
        platform = jax.default_backend()
        path = os.path.join(_cache_dir(), _key(self.name, sig, platform))
        if os.path.exists(path):
            try:
                _register_serializations()
                t0 = time.time()
                with open(path, "rb") as fh:
                    exported = jexport.deserialize(bytearray(fh.read()))
                runner = jax.jit(exported.call)
                if debug:
                    print(
                        f"[aot] load {self.name}: {time.time()-t0:.1f}s",
                        file=sys.stderr, flush=True,
                    )
                return runner
            except Exception as e:
                if debug:
                    print(
                        f"[aot] load FAILED {self.name}: {e!r}",
                        file=sys.stderr, flush=True,
                    )
                try:
                    os.remove(path)
                except OSError:
                    pass
        try:
            _register_serializations()
            t0 = time.time()
            exported = jexport.export(
                self._jit(),
                disabled_checks=[
                    jexport.DisabledSafetyCheck.custom_call(c)
                    for c in ("tpu_custom_call", "Sharding",
                              "annotate_device_placement")
                ],
            )(*args)
            blob = exported.serialize()
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, path)
            if debug:
                print(
                    f"[aot] export {self.name}: {time.time()-t0:.1f}s "
                    f"({len(blob)/1e6:.1f} MB)",
                    file=sys.stderr, flush=True,
                )
            return jax.jit(exported.call)
        except Exception as e:
            if debug:
                print(
                    f"[aot] export FAILED {self.name}: {e!r}",
                    file=sys.stderr, flush=True,
                )
            # export unsupported for this function — plain jit from now on
            runner = self._jit()
            return runner


_AOT_FNS: Dict[str, _AotFn] = {}


def aot_jit(name: str, fn) -> _AotFn:
    """Drop-in for jax.jit(fn) with disk-backed AOT export caching.

    The registry is keyed by NAME ALONE: `name` (+ the input signature)
    must uniquely identify the computation — fold any static values the
    function closes over into it, and never close over value-bearing
    arrays (they would be frozen into the export as constants). Keying by
    name lets callers that re-create closures per invocation (streamed
    commit/reopen build their bodies per prove) reuse the already-loaded
    compiled runner instead of re-loading the executable every call."""
    got = _AOT_FNS.get(name)
    if got is None:
        got = _AotFn(name, fn)
        _AOT_FNS[name] = got
    return got
