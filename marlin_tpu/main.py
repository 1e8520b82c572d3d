"""CLI entry point: run a MOOSE-format deck with the TPU-native framework.

Usage (mirrors the reference app binary `marlin-opt -i deck.i [overrides]`,
reference src/main.C:14-17):

    python -m marlin_tpu -i deck.i [path/to/param=value ...]
    python -m marlin_tpu deck.i ss=10 cs=0 order=1
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog="marlin_tpu")
    parser.add_argument("-i", "--input", help="input deck")
    parser.add_argument("args", nargs="*", help="deck file and/or HIT overrides")
    parser.add_argument("--compute-device", default=None,
                        help="jax platform override (cpu, tpu, ...)")
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--x64", action="store_true", default=None,
                        help="force double precision")
    parser.add_argument("--timing", action="store_true",
                        help="print the perf-graph summary (same as "
                        "`[Outputs] perf_graph = true` in the deck)")
    ns = parser.parse_args(argv)

    deck = ns.input
    overrides = []
    for a in ns.args:
        if deck is None and not ("=" in a):
            deck = a
        else:
            overrides.append(a)
    if deck is None:
        parser.error("no input deck given")

    # --compute-device / MARLIN_TPU_DEVICE, with the reference's env var
    # accepted as an alias (reference src/base/MarlinApp.C:28-41); torch
    # device names map onto JAX platforms
    device = (
        ns.compute_device
        or os.environ.get("MARLIN_TPU_DEVICE")
        or os.environ.get("MARLIN_TORCH_DEVICE")
    )
    if device:
        # torch device names may carry an index ('cuda:0'); JAX platform
        # names don't
        device = device.split(":")[0]
        device = {"cuda": "gpu", "mps": "cpu"}.get(device, device)
    import jax

    if device:
        jax.config.update("jax_platforms", device)
    # DEVICE_DEFAULT precision is "double where supported" (reference
    # src/utils/MarlinUtils.C:38-42) — that includes a CPU backend selected
    # via JAX_PLATFORMS, not just via --compute-device
    if ns.x64 or (device == "cpu") or (
        not device and jax.default_backend() == "cpu"
    ):
        jax.config.update("jax_enable_x64", True)
    # persistent compilation cache (the reference's trace-once story maps
    # onto XLA's compile cache), default ON: the axon remote-TPU backend
    # deserializes cached executables correctly (r04 measurement, 38.6 s ->
    # 3.8 s across processes; the earlier "cannot deserialize" finding no
    # longer reproduces).  Default dir: a pre-warmed .jax_cache next to the
    # package (source checkouts ship one) else ~/.cache/marlin_tpu/xla.
    # MARLIN_TPU_COMPILE_CACHE overrides; empty or "0" disables.
    cache_dir = os.environ.get("MARLIN_TPU_COMPILE_CACHE")
    if cache_dir is None:
        repo_cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache")
        cache_dir = repo_cache if os.path.isdir(repo_cache) else (
            os.path.expanduser("~/.cache/marlin_tpu/xla"))
    if cache_dir and cache_dir != "0":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # multi-host launch (docs/multihost.md): one process per host, all
    # joining a jax.distributed cluster; jax.devices() then spans every
    # host and [Domain] parallel_mode meshes lay shardings across the
    # whole cluster (ICI within a slice, DCN across).  The reference's MPI
    # world maps onto this (reference uses MPI ranks; SURVEY §5.8).
    if os.environ.get("MARLIN_TPU_COORDINATOR"):
        jax.distributed.initialize(
            coordinator_address=os.environ["MARLIN_TPU_COORDINATOR"],
            num_processes=int(os.environ.get("MARLIN_TPU_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("MARLIN_TPU_PROCESS_ID", "0")),
        )

    from . import hit
    from .executioner import run_deck

    root = hit.load(deck, overrides + (["Outputs/perf_graph=true"] if ns.timing else []))
    stem = os.path.splitext(os.path.basename(deck))[0]
    out_node = root.children.get("Outputs")
    file_base = out_node.get("file_base") if out_node is not None else None
    transient = run_deck(
        root,
        file_base=file_base or stem + "_out",
        # outputs land in the CWD (MOOSE semantics) — NOT next to the deck,
        # which may live in a read-only tree
        output_dir=ns.output_dir or os.getcwd(),
        deck_stem=stem,
        deck_dir=os.path.dirname(os.path.abspath(deck)),
    )
    print(f"Finished after {transient.step_count} steps, t = {transient.time}")
    for k, v in transient.pp_values.items():
        print(f"  {k} = {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
