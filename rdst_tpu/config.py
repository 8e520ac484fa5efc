"""Global configuration for rdst_tpu.

Like the reference's cargo features + builder flags (reference:
Cargo.toml:15-18, src/radix_sort_builder.rs:53-132) but runtime-settable.
"""
from __future__ import annotations

import contextlib
import os

import jax


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def pallas_interpret() -> bool:
    """Run Pallas kernels in interpreter mode when no TPU is present.

    This is the test strategy for multi-threaded algorithms without the
    target hardware (SURVEY.md §4 "Multi-node without a cluster").
    """
    forced = os.environ.get("RDST_TPU_FORCE_INTERPRET")
    if forced is not None:
        return forced not in ("0", "false", "")
    return not on_tpu()


#: Size cap for the bucketed MSB plan. The (256, cap) padded-bucket
#: pipeline's compile time grows steeply with input size (the batched
#: sort + ragged writeback graph); above this many elements the plan
#: falls back to the comparative network, which at these sizes is within
#: ~15% of bucketed throughput anyway (BENCH_NOTES.md). Override with
#: RDST_TPU_MAX_BUCKETED or set at runtime.
max_bucketed_elements = int(
    os.environ.get("RDST_TPU_MAX_BUCKETED", str(20_000_000))
)

#: Working-set size (bytes, all operand planes) above which the REGIONS
#: plan actually engages its low-memory chunked machinery. The reference
#: picks Regions for RESOURCE reasons (bounded extra workspace,
#: regions_sort.rs:3-10); below real memory pressure the measured-fastest
#: executor for Regions' tuner regime (large skewed/low-entropy inputs)
#: is the level-compaction plan — the chunked path's bitonic merge tree
#: costs ~3.5x a direct network sort (probe12 P5), a price only worth
#: paying when 2-3x sort workspace would not fit. v5e HBM is 16 GiB;
#: the default engages chunking when planes exceed 2 GiB.
low_mem_threshold_bytes = int(
    os.environ.get("RDST_TPU_LOW_MEM_THRESHOLD", str(2 << 30))
)

#: Host-native fast path: numpy inputs up to this many elements sort on
#: the C++ host runtime (native/rdst_host.cpp) instead of paying the
#: device dispatch round trip (~3 ms over the tunnel, CLAUDE.md). The
#: multithreaded host LSD sorts small arrays in well under a millisecond.
#: 0 disables. Only the default tuners take this path — forcing an
#: Algorithm or supplying a custom tuner always runs the device plans.
host_sort_max = int(os.environ.get("RDST_TPU_HOST_SORT_MAX", str(1 << 18)))

#: Stage-1 intermediate buffer headroom for the hierarchical (host, chip)
#: exchange. Stage 1 lands each destination HOST's rows on the source
#: chip's column-peer, so a chip's stage-1 receive load is bounded by the
#: column's share of the host's incoming data, not by the final balanced
#: per-chip capacity — skewed routing that funnels one host's rows
#: through a single chip column can need more than ``capacity`` rows in
#: flight even when the FINAL distribution fits. The stage-1 buffer is
#: sized ``ceil(capacity * hier_stage1_headroom)``; overflow beyond that
#: is detected (the poisoned count raises OverflowError in gather_valid).
#: Measured (scripts/capacity_study.py, BENCH_NOTES round 5): uniform and
#: bimodal route evenly (stage-1 load ~= final load); the headroom is
#: insurance for adversarial funneling.
hier_stage1_headroom = float(
    os.environ.get("RDST_TPU_HIER_STAGE1_HEADROOM", "1.5")
)

#: Hot-bucket refinement depth for the distributed shuffle's partition
#: (shuffle._refined_assignment). Each level re-windows THE hottest
#: multi-key bucket with a fresh 16-bit window over its own key range —
#: the distributed analog of the reference's per-bucket depth recursion
#: (sorter.rs:121-171). 2 levels (48 effective window bits) balance
#: every distribution in scripts/capacity_study.py (bimodal demand
#: 4.0 -> ~1.0, zipf 3.9 -> ~1.0); mass hidden below 48 adaptive window
#: bits still falls back to atomic assignment + the OverflowError /
#: distributed_sort_auto escape. 0 disables refinement.
shuffle_refine_levels = int(
    os.environ.get("RDST_TPU_REFINE_LEVELS", "2")
)

#: EXPERIMENTAL: route the distributed shuffle's 1-axis exchange through
#: the Pallas remote-DMA kernel (parallel/remote_dma.py — the SURVEY §5
#: comm-backend kernel) instead of ``jax.lax.ragged_all_to_all``.
#: Requires a real multi-chip TPU mesh; structurally and layout-tested
#: but execution-UNVERIFIED on hardware (this build env has one chip).
#: Read at trace time — set before the first distributed_sort call.
use_remote_dma_exchange = os.environ.get(
    "RDST_TPU_REMOTE_DMA", "0"
) not in ("0", "false", "")

#: Small-table replication bound for :func:`partition_exchange`. A
#: partitioned dataset no larger than this many rows gets FULL-TABLE
#: per-device capacity (any partition skew is covered — a device can
#: never receive more rows than exist), so co-partitioning a small dim
#: table against a skewed fact partition needs no mesh-size-scaled
#: capacity_factor. Cost ceiling: this many rows x planes x 4 B per
#: device (64 Ki rows ~ 1 MB for a 4-plane table).
replicate_capacity_max = int(
    os.environ.get("RDST_TPU_REPLICATE_CAP_MAX", str(1 << 16))
)

#: Presorted-input advantage (reference analog: lsb_sort.rs:62-83 skips
#: newly-sorted levels at runtime; benches/struct_sort.rs:43-127 measures
#: 90%-presorted inputs): when the histogram pass finds a sorted prefix
#: covering at least half the input, the sorter sorts only the suffix and
#: bitonic-merges the halves (ops/merge.py). The split is quantized to
#: sixteenths of the padded size so the jit cache stays bounded. 0
#: disables; the default engages where the fused merge is measured ~10x
#: the XLA stage loop (>= 2^17 elements).
presorted_merge_min = int(
    os.environ.get("RDST_TPU_PRESORTED_MIN", str(1 << 17))
)


# work_profiles-equivalent: trace per-level algorithm picks
# (reference: Cargo.toml:18, src/sorter.rs:78-79).
_work_profiles = [os.environ.get("RDST_TPU_WORK_PROFILES", "0") not in ("0", "")]


def work_profiles_enabled() -> bool:
    return _work_profiles[0]


@contextlib.contextmanager
def work_profiles(enabled: bool = True):
    old = _work_profiles[0]
    _work_profiles[0] = enabled
    try:
        yield
    finally:
        _work_profiles[0] = old
