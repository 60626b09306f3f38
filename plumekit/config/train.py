"""Model / training / data / mesh / inference configs.

The reference's model layer is absent (``src/models/`` holds an empty
``__init__.py``; entry points promised at ``README.md:41-45``). These configs
define the TPU-first U-Net stack that fills that gap (BASELINE.json
north star + configs 1-5).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class UNetConfig:
    """U-Net: double-conv encoder blocks, transposed-conv upsampling, skip
    concatenations (BASELINE.json north_star)."""

    in_channels: int = 2          # AOD + rasterised fire channel
    out_channels: int = 1         # plume logit
    base_features: int = 32
    depth: int = 4                # number of down/up stages
    norm: str = "batch"           # "batch" | "group" | "none"
    group_norm_groups: int = 8
    #: architecture family: "unet" (the reference's promised model) or
    #: "unetpp" (UNet++ nested dense skips, Zhou et al. 2018 — denser
    #: multi-scale fusion at ~1.6x the decoder params; same (B, H, W, 1)
    #: logits contract, so every train/infer/export path is shared)
    arch: str = "unet"
    #: UNet++ only: average the per-column side heads instead of reading
    #: the last column alone (the paper's deep-supervision mode)
    deep_supervision: bool = False
    #: UNet++ + deep_supervision only, SERVING-time: truncate the nested
    #: grid at fusion column L (the paper's "model pruning" mode — head j
    #: only depends on nodes X[i][k] with i+k ≤ j, so a deep-supervised
    #: checkpoint serves at any L ∈ [1, depth] with the heads 1..L
    #: averaged; L = depth reproduces the full model exactly). Set via
    #: ``predict_model/serve/export_model --prune-level``; training
    #: rejects it (the checkpoint always holds the full grid).
    prune_level: int | None = None
    #: compute dtype; params stay fp32 masters (config 4: bf16 mixed precision)
    compute_dtype: str = "bfloat16"
    #: use the fused Pallas conv+norm+ReLU kernel on TPU (lax.conv fallback)
    use_pallas: bool = False
    #: run inference through the whole-forward Pallas megakernel when the
    #: geometry is eligible (batch norm, dims divisible by 2**depth — see
    #: models/pallas/unet_mega.mega_eligible). One dispatched program for
    #: the entire U-Net: ~1.5-1.7x XLA for small/moderate tile batches on
    #: v5e; the XLA path remains faster for whole-granule batches
    #: (BASELINE.md megakernel row).
    use_mega: bool = False


@dataclass(frozen=True)
class TrainConfig:
    #: global batch (sharded over the data axis). Round-5 roofline note:
    #: the chip's fwd+bwd throughput jumps at batch 128 (the batch dim
    #: fills the MXU tile: 46.5 → 77.2 MPix/s at 288² tiles, 192 OOM-
    #: spills back to 57 — BASELINE.md round-5 train-roofline row); the
    #: 16-default preserves the measured quality protocols — raise it
    #: (with an lr rescale) when throughput matters more.
    batch_size: int = 16
    tile_size: int = 512          # config 2: 512x512 multi-band tiles
    learning_rate: float = 3e-4
    weight_decay: float = 1e-4
    warmup_steps: int = 100
    total_steps: int = 2000
    dice_weight: float = 0.5      # loss = w*dice + (1-w)*bce
    seed: int = 0
    checkpoint_dir: str = "checkpoints"
    checkpoint_every: int = 200
    log_every: int = 20
    augment: bool = True          # on-device flips/rot90 (config 4)
    #: BCE target smoothing ε (y → y·(1−2ε)+ε) — weak-label noise hedge
    label_smooth: float = 0.0
    #: evaluate the dev set every N steps (0 = only at the end)
    eval_every: int = 0
    #: stop after this many consecutive evals without dev-IoU improvement
    #: (0 = never stop early); requires eval_every > 0
    early_stop_patience: int = 0
    #: optimizer steps scanned inside one dispatched program (1 = a program
    #: per step). On the tunneled platform a fixed ~45 ms dispatch latency
    #: rides on every program, comparable to a config-2 step itself;
    #: chunks never cross a log/eval/checkpoint boundary, and per-step
    #: keys/data order are bit-exact vs the single-step path
    steps_per_dispatch: int = 1
    #: upload tile batches as uint16 channels + uint8 masks and decode on
    #: device inside the train step (4 B/px instead of 12). The production
    #: loop is host→device transfer-bound on the tunneled platform
    #: (BASELINE.md round 3: ~3.2 MB/batch over a ~40 MB/s link exceeds
    #: the step itself); granules are quantized ONCE up front so nothing
    #: is added to the per-batch hot path. Affine uint16 error ≤
    #: range/131070 (~2e-5 on physical AOD) — far below bf16 compute
    #: precision; masks encode exactly
    quantize_transfer: bool = False
    #: keep the ENTIRE training set resident in HBM and draw/augment tiles
    #: inside the scanned step program (``train/device_data.py``) — the
    #: per-step host→device hop disappears entirely, which supersedes
    #: quantize_transfer's payload shrinking on transfer-bound platforms
    #: (the 60-granule protocol is ~90-190 MB vs 16 GB HBM). Composes with
    #: quantize_transfer (then the HBM copy is uint16/uint8, 3× the
    #: granules per byte, dequantized per tile after the slice) and with
    #: steps_per_dispatch (the natural pairing: K steps per dispatch with
    #: zero upload). Draw schedule is counter-based in (seed, step) —
    #: deterministic and resume-stable, but a DIFFERENT sequence than the
    #: host iterator's numpy draws
    device_data: bool = False
    #: offline knowledge distillation (``train/distill.py``): a checkpoint
    #: dir whose model re-labels the TRAINING granules with its soft
    #: probabilities before the loop starts (the dev set keeps the
    #: original labels so dev IoU stays comparable). The teacher forward
    #: runs once per granule through the amortised sliding-inference
    #: path, not per step — zero hot-path cost
    distill_from: Optional[str] = None
    #: label blend ``y' = a·p_teacher + (1−a)·y`` — BCE is linear in the
    #: target, so this IS the classic mixed KD loss at weight a. Default
    #: 1.0 (pure teacher labels): the measured best — the teacher is a
    #: DENOISER of the weak masks, and blending weak mass back in hurts
    #: (0.795 vs 0.783 at a=0.7, BASELINE.md distillation row)
    distill_alpha: float = 1.0
    #: teacher logits are divided by T before the sigmoid (T > 1 softens)
    distill_temp: float = 1.0
    #: serve the teacher pruned at fusion column L (UNet++ deep-supervision
    #: teachers; see UNetConfig.prune_level)
    distill_prune_level: Optional[int] = None
    #: sliding-infer geometry for the teacher pass (None = the serving
    #: default, the measured 288/32/64 optimum; tests shrink it)
    distill_infer: Optional["InferConfig"] = None
    #: D4-average the teacher's soft labels (8 views in one folded forward
    #: — offline ensemble denoising of the targets at one-time cost)
    distill_tta: bool = False
    #: recenter teacher logits so its calibrated operating point t* maps
    #: to 0.5 (``p' = sigmoid(z/T − logit(t*))``): the student inherits
    #: calibrated targets instead of re-learning the shift. Pass the
    #: threshold persisted by ``evaluate_model --write-threshold``
    distill_calibrate: Optional[float] = None


@dataclass(frozen=True)
class DataConfig:
    """Synthetic-granule dataset (no real MAIAC volumes are available;
    SURVEY.md §7 hard part #5)."""

    granule_size: int = 1200      # full MAIAC tile is 1200x1200 (tools.py:116-122)
    tile_size: int = 256
    tiles_per_granule: int = 32
    n_train_granules: int = 8
    n_eval_granules: int = 2
    seed: int = 1234


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh axes (SURVEY.md §2.2): ``data`` for DP batch sharding,
    ``y``/``x`` for spatial (context-parallel analogue) sharding of the raster
    plane with halo exchange."""

    data: int = 1
    y: int = 1
    x: int = 1

    @property
    def shape(self) -> Tuple[int, ...]:
        return (self.data, self.y, self.x)

    @property
    def n_devices(self) -> int:
        return self.data * self.y * self.x


@dataclass(frozen=True)
class InferConfig:
    """Sliding-window full-granule inference (config 3)."""

    # defaults = the measured optimum geometry (docs/performance.md): 288/32
    # tiles a 1024²-multiple granule with 1.27× overlap redundancy and zero
    # batch padding, and 64-tile batches put a whole 2048² grid through one
    # forward (64 small tiles beat fewer big ones ~2× on the MXU)
    tile_size: int = 288
    overlap: int = 32             # blended overlap between adjacent tiles
    batch_tiles: int = 64         # tiles per device batch
    threshold: float = 0.5        # mask = sigmoid(logit) > threshold
    #: probability-plane dtype of the returned canvas: "float" (fp32) or
    #: "uint8" (p8 = rint(p·255), the readback codec of ``ops/quant``).
    #: With uint8 the whole post-forward epilogue — scan outputs, canvas
    #: assembly, threshold, and the (G, H, W) result the host reads back —
    #: runs at 1 byte/px instead of 4; the mask compares p8 against
    #: ⌊threshold·255⌋ so decisions flip only within 1/510 of the
    #: threshold (the documented codec band). Overlap-blend still
    #: accumulates fp32 and encodes at the end (weighted sums need the
    #: headroom); the fast overlap=0 path is uint8 end-to-end
    emit: str = "float"
