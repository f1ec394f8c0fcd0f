"""Round-10 invariants: behavior fingerprints must be RUNTIME-STABLE
— computing a query's fingerprint before vs after the query family's
side-effectful machinery has run must give the same hash, or the
driver-window invariant flakes depending on test order (the r10
mid-suite failure: proto_vendor memoized into bare module scalars,
which the ledger hashes as reached constants, so q277's fingerprint
flipped the moment any TWS query ran). Repo convention pinned here:
runtime-mutable module state lives in DICTS (never hashed), bare
module scalars are reserved for true constants."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools import evidence_ledger as EL  # noqa: E402


def test_fingerprints_stable_across_runtime_state_mutation():
    """Exercise the two known side-effect channels (protobuf vendoring
    memo, injected multimodal codec) and assert no registered query's
    fingerprint moves. Catches any future bare-scalar memo the same
    way the window test did — but deterministically, not
    order-dependently."""
    from ecowatt_etl_spark.operators import multimodal
    from ecowatt_etl_spark.queries.registry import all_queries
    from ecowatt_etl_spark.streaming import proto_vendor

    specs = all_queries()
    probes = [
        n
        for n in (
            "q277_stream_totals_tws",
            "q49c_stream_dedup",
            "q80_media_stats",
            "q82_media_resize",
            "q83_frame_sample",
        )
        if n in specs
    ]
    before = {
        n: EL.behavior_fingerprint(specs[n].fn, specs[n].oracle)
        for n in probes
    }
    proto_vendor.ensure_protobuf()
    proto_vendor._patched_zip()
    multimodal.set_codec(multimodal.FakeCodec())
    try:
        after = {
            n: EL.behavior_fingerprint(specs[n].fn, specs[n].oracle)
            for n in probes
        }
    finally:
        multimodal.set_codec(None)
    moved = [n for n in probes if before[n] != after[n]]
    assert not moved, (
        f"runtime state mutation moved fingerprints for {moved}: "
        "memoized state must live in a dict, not bare module scalars"
    )


def test_no_bare_scalar_rebinding_in_package_modules():
    """Static sweep of the convention: no function in the package may
    rebind a module-level name via ``global`` to a SIMPLE value the
    fingerprinter would hash. Walks every module's AST; flags
    ``global x`` where x is bound at module level to a fingerprintable
    scalar (None/bool/int/float/str/bytes or tuples thereof)."""
    import ast
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parent.parent / "ecowatt_etl_spark"
    offenders = []
    for path in sorted(pkg.rglob("*.py")):
        tree = ast.parse(path.read_text())
        module_scalars = set()
        for node in tree.body:
            targets = []
            if isinstance(node, ast.Assign):
                targets = [
                    t.id for t in node.targets if isinstance(t, ast.Name)
                ]
                val = node.value
            elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name
            ):
                targets = [node.target.id]
                val = node.value
            else:
                continue
            if val is None:
                continue
            # tuples count only when every element is a constant —
            # the fingerprinter hashes constant tuples, but a tuple of
            # non-constant refs is opaque to it, and flagging one here
            # would force a spurious refactor (r10 ADVICE)
            if isinstance(val, ast.Constant) or (
                isinstance(val, ast.Tuple)
                and all(isinstance(e, ast.Constant) for e in val.elts)
            ):
                module_scalars.update(targets)
        for node in ast.walk(tree):
            if isinstance(node, ast.Global):
                for name in node.names:
                    if name in module_scalars:
                        offenders.append(f"{path.name}:{node.lineno} {name}")
    assert not offenders, (
        "module-scalar rebinding via `global` breaks fingerprint "
        f"runtime-stability; use a dict: {offenders}"
    )
