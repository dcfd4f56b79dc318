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

import ast
import hashlib
import os
from typing import Dict, List, Optional, Set, Tuple

_CODE_HASH: Optional[str] = None
_DIR: Optional[str] = None
_DISABLED: Optional[bool] = None
_REGISTERED = False
_FILE_HASHES: Optional[Dict[str, str]] = None
_DEP_GRAPH: Optional[Dict[str, Set[str]]] = None
_MODULE_HASHES: Dict[str, str] = {}


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


def _pkg_dir() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def package_code_hash() -> str:
    """Content hash of every package source file. Used where ANY package
    edit must invalidate (stage-level prove checkpoints, whose validity
    cannot be scoped to a module subset safely)."""
    global _CODE_HASH
    if _CODE_HASH is None:
        h = hashlib.sha256()
        for rel in sorted(_file_hashes()):
            h.update(rel.encode())
            h.update(_file_hashes()[rel].encode())
        import jax

        h.update(jax.__version__.encode())
        _CODE_HASH = h.hexdigest()[:16]
    return _CODE_HASH


def _file_hashes() -> Dict[str, str]:
    """{relative .py path: sha256 of contents} over the package tree."""
    global _FILE_HASHES
    if _FILE_HASHES is None:
        pkg = _pkg_dir()
        out: Dict[str, str] = {}
        for root, _dirs, files in sorted(os.walk(pkg)):
            for fname in sorted(files):
                if fname.endswith(".py"):
                    p = os.path.join(root, fname)
                    with open(p, "rb") as fh:
                        out[os.path.relpath(p, pkg)] = hashlib.sha256(
                            fh.read()
                        ).hexdigest()
        _FILE_HASHES = out
    return _FILE_HASHES


def _module_deps(rel: str) -> Set[str]:
    """Package-internal import targets of module `rel` (relative .py path),
    resolved from EVERY Import/ImportFrom in the file (including imports
    nested inside functions). Unresolvable names resolve to their package
    __init__.py — coarse but safe."""
    pkg = _pkg_dir()
    pkg_name = os.path.basename(pkg)
    files = _file_hashes()

    def exists(parts: List[str]) -> Optional[str]:
        cand = os.path.join(*parts) + ".py" if parts else None
        if cand and cand in files:
            return cand
        cand = os.path.join(*(parts + ["__init__.py"])) if parts else "__init__.py"
        return cand if cand in files else None

    try:
        with open(os.path.join(pkg, rel), "rb") as fh:
            tree = ast.parse(fh.read())
    except SyntaxError:
        return set(files)  # unparseable: depend on everything
    # this module's package parts, e.g. protocol/stark.py -> ["protocol"]
    mod_pkg = rel.replace(os.sep, "/").split("/")[:-1]
    deps: Set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                parts = alias.name.split(".")
                if parts[0] == pkg_name:
                    got = exists(parts[1:])
                    if got:
                        deps.add(got)
        elif isinstance(node, ast.ImportFrom):
            if node.level == 0:
                parts = (node.module or "").split(".")
                if parts and parts[0] == pkg_name:
                    base = parts[1:]
                else:
                    continue
            else:
                base = mod_pkg[: len(mod_pkg) - (node.level - 1)]
                if node.module:
                    base = base + node.module.split(".")
            got = exists(base)
            if got:
                deps.add(got)
            for alias in node.names:
                got = exists(base + [alias.name])
                if got:
                    deps.add(got)
    return deps


def _dep_graph() -> Dict[str, Set[str]]:
    global _DEP_GRAPH
    if _DEP_GRAPH is None:
        _DEP_GRAPH = {rel: _module_deps(rel) for rel in _file_hashes()}
    return _DEP_GRAPH


def _module_code_hash(filename: str) -> str:
    """Per-module code hash: the module's source content plus that of its
    TRANSITIVE package-internal imports (+ jax version). AOT exports keyed
    by this survive edits to unrelated modules — editing fri.py no longer
    invalidates the LDE stage exports (round-4 verdict item 8). Functions
    defined outside the package fall back to the whole-package hash."""
    pkg = _pkg_dir()
    try:
        rel = os.path.relpath(os.path.abspath(filename), pkg)
    except ValueError:
        return package_code_hash()
    if rel.startswith("..") or rel not in _file_hashes():
        return package_code_hash()
    if rel not in _MODULE_HASHES:
        graph = _dep_graph()
        seen = {rel}
        frontier = [rel]
        while frontier:
            cur = frontier.pop()
            for dep in graph.get(cur, ()):
                if dep not in seen:
                    seen.add(dep)
                    frontier.append(dep)
        h = hashlib.sha256()
        for r in sorted(seen):
            h.update(r.encode())
            h.update(_file_hashes()[r].encode())
        import jax

        h.update(jax.__version__.encode())
        _MODULE_HASHES[rel] = h.hexdigest()[:16]
    return _MODULE_HASHES[rel]


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


def _fn_code_hash(fn) -> str:
    """Code hash scoped to the module defining `fn` (see
    _module_code_hash)."""
    import functools

    while isinstance(fn, functools.partial):
        fn = fn.func
    code = getattr(fn, "__code__", None)
    if code is None:
        return package_code_hash()
    return _module_code_hash(code.co_filename)


def _key(name: str, sig: str, platform: str, code_hash: str) -> str:
    return hashlib.sha256(
        f"{name}\x00{code_hash}\x00{platform}\x00{sig}".encode()
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
        path = os.path.join(
            _cache_dir(),
            _key(self.name, sig, platform, _fn_code_hash(self.fn)),
        )
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
                _warn_once(f"AOT cache load failed for stage "
                           f"'{self.name}' ({e!r}); re-exporting")
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
            # a systematic export failure silently disables the warmup
            # optimization — surface it once per stage (ADVICE r4)
            _warn_once(f"AOT export failed for stage '{self.name}' "
                       f"({e!r}); falling back to plain jit")
            if debug:
                print(
                    f"[aot] export FAILED {self.name}: {e!r}",
                    file=sys.stderr, flush=True,
                )
            # export unsupported for this function — plain jit from now on
            runner = self._jit()
            return runner


_WARNED: Set[str] = set()


def _warn_once(msg: str):
    key = msg.split("(")[0]
    if key in _WARNED:
        return
    _WARNED.add(key)
    import warnings

    warnings.warn(msg, RuntimeWarning, stacklevel=3)


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
