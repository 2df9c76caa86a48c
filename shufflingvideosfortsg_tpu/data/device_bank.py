"""Device-resident feature bank: gather batches in HBM, not over PCIe.

The as-shipped driver path gathered `[B, T, D]` feature batches on the
host and shipped them host->device every step. On this image the
host->device link runs at ~13-26 MB/s (an 8 MB Charades batch costs
~309 ms, measured with a host-fetch barrier), so the whole training
driver was H2D-bound: ~142 pairs/s against 2,187 pairs/s device-resident.

The TPU-native fix is to make the *feature pack itself* device-resident:
upload the whole `FEATPAK1` blob (f16, 1.55 GiB for Charades-CD) into HBM
once, keep the GloVe embedding matrix resident too, and per step ship
only O(B) integers — pack rows, token ids, framestamps. Feature assembly
(row gather, GloVe lookup, the four reference masks) happens inside the
jitted step. The reference has no analog (its DataLoader re-reads .npy
files per sample every epoch, charades_pair_aug.py:87-88).

The bank arrays ride into jitted steps as ARGUMENTS (attached to the
batch dict by ``attach``), never as Python closures: a closed-over
jax.Array is baked into the HLO as a constant, and shipping a 1.5 GiB
constant to the (remote) compiler took minutes vs 0.6 s as a parameter
(measured: 104 s vs 0.6 s for a 256 MB bank).

Parity: the assembled batch is bit-identical to the host-gathered one —
the same pack bytes, the same `vocab.embeddings` rows, and
``ops.augment_device.device_masks`` replicates `data/masks.py` inclusive-
end semantics (tests/test_device_bank.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import replicated_sharding

# batch keys the assembler produces on device; the loader's device mode
# strips them from host batches (collated but never shipped)
ASSEMBLED_KEYS = ('video_feat', 'sent_feat', 'sent_mask', 'video_mask',
                  'temporal_labels', 'fore_masks', 'back_masks')

# keys under which the resident arrays ride into jitted steps
BANK_FEATS = 'bank_feats'
BANK_EMB = 'bank_emb'
BANK_SCALE = 'bank_scale'  # int8 tier only: per-(video, frame) dequant scales


def _quant_chunk(a: np.ndarray):
    """Symmetric per-(video, frame) int8 quantization of [..., D] features.

    scale = rowwise amax / 127 (1/127 for all-zero rows), so the dequant
    error is bounded by scale/2 = amax/254 per element — about 0.4% of the
    frame's dynamic range, below bf16's 2^-8 relative step for the row's
    largest values. Returns (int8 values, f32 scales[...])."""
    a = np.asarray(a, np.float32)
    amax = np.max(np.abs(a), axis=-1)
    scale = (np.where(amax > 0, amax, 1.0) / 127.0).astype(np.float32)
    q = np.clip(np.rint(a / scale[..., None]), -127, 127).astype(np.int8)
    return q, scale


def _upload_replicated(host: np.ndarray, sharding, chunk_bytes: int,
                       convert=None):
    """Upload a host array replicated across the mesh, chunked along axis
    0 into a preallocated device buffer.

    Memory: chunked-put + jnp.concatenate needs 2x the pack in HBM at
    once (OOMed the 6.5 GiB ANet-CD bank on a 16 GiB chip); a single
    giant device_put peaks at 1x but the transfer link handles one huge
    buffer far worse than a stream of ~64 MB ones (6.5 GiB blew a 580 s
    timeout standalone). Writing each chunk into a preallocated buffer
    with a donated dynamic_update_slice keeps BOTH properties: 1x + one
    chunk of HBM, streaming-sized transfers.
    """
    dt = host.dtype if convert is None else np.dtype(convert)

    def prep(a):
        a = np.ascontiguousarray(a)
        return a if convert is None else a.astype(dt)

    if jax.process_count() > 1:
        # multi-controller: every process holds the same pack file, so a
        # callback-based assembly provides each addressable replica
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: prep(host[idx]))
    row_bytes = max(1, int(np.prod(host.shape[1:])) * dt.itemsize)
    rows = max(1, chunk_bytes // row_bytes)
    if rows >= host.shape[0]:
        return jax.device_put(prep(host), sharding)
    buf = jax.jit(lambda: jnp.zeros(host.shape, dt),
                  out_shardings=sharding)()
    zeros_nd = (0,) * (host.ndim - 1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def write(b, chunk, at):
        starts = (at,) + tuple(jnp.zeros((), jnp.int32) for _ in zeros_nd)
        return jax.lax.dynamic_update_slice(b, chunk, starts)

    for i in range(0, host.shape[0], rows):
        chunk = jax.device_put(prep(host[i:i + rows]), sharding)
        buf = write(buf, chunk, np.int32(i))
    return buf


def _upload_quantized(mm, sharding, chunk_bytes: int):
    """int8 bank tier upload: stream the pack through per-chunk symmetric
    quantization (no full-size host copy), returning (int8 feats [V,T,D],
    f32 scales [V,T]) resident on device. Quarter of an f32 pack's bytes,
    half of an f16/bf16 one — both for the slow-link upload and the HBM
    residency; the per-batch gather dequantizes on device (``assemble``)."""
    V, T = mm.shape[0], mm.shape[1]
    if jax.process_count() > 1:
        # multi-controller: callback-based assembly per addressable replica.
        # Quantization always runs over FULL feature rows (mm[idx[:2]]) so a
        # hypothetical D-sharded layout could not corrupt the scales.
        feats = jax.make_array_from_callback(
            mm.shape, sharding,
            lambda idx: _quant_chunk(mm[tuple(idx[:2])])[0][
                (slice(None), slice(None)) + tuple(idx[2:])])
        scales = jax.make_array_from_callback(
            (V, T), sharding, lambda idx: _quant_chunk(mm[tuple(idx)])[1])
        return feats, scales
    rows = max(1, chunk_bytes // max(1, T * int(mm.shape[2])))
    if rows >= V:
        q, s = _quant_chunk(mm)
        return (jax.device_put(q, sharding), jax.device_put(s, sharding))
    q_buf = jax.jit(lambda: jnp.zeros(mm.shape, jnp.int8),
                    out_shardings=sharding)()
    s_buf = jax.jit(lambda: jnp.zeros((V, T), jnp.float32),
                    out_shardings=sharding)()

    @functools.partial(jax.jit, donate_argnums=(0,))
    def write(b, chunk, at):
        starts = (at,) + tuple(jnp.zeros((), jnp.int32)
                               for _ in range(b.ndim - 1))
        return jax.lax.dynamic_update_slice(b, chunk, starts)

    for i in range(0, V, rows):
        q, s = _quant_chunk(mm[i:i + rows])
        q_buf = write(q_buf, jax.device_put(q, sharding), np.int32(i))
        s_buf = write(s_buf, jax.device_put(s, sharding), np.int32(i))
    return q_buf, s_buf


def assemble(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Jit-traceable: turn an index-only batch (pack_row/token_ids/
    framestps/... plus the attached bank arrays) into the full model batch.
    Batches without 'pack_row' pass through untouched, so the same step
    factory serves both host-gather and device-bank loaders."""
    if 'pack_row' not in batch:
        return batch
    batch = dict(batch)
    feats = batch.pop(BANK_FEATS)
    emb = batch.pop(BANK_EMB)
    scales = batch.pop(BANK_SCALE, None)
    rows = batch.pop('pack_row').astype(jnp.int32)
    gathered = jnp.take(feats, rows, axis=0)
    if gathered.dtype == jnp.int8:
        # int8 bank tier: dequantize the gathered rows on device against
        # their per-frame scales (error ≤ amax/254 per element; decode
        # neutrality asserted in tests/test_device_bank.py)
        s = jnp.take(scales, rows, axis=0)
        gathered = gathered.astype(jnp.float32) * s[..., None]
    elif gathered.dtype == jnp.bfloat16:
        # bf16 bank tier: widen the per-batch gather back to f32 so the
        # model numerics match the host path up to the one f32->bf16
        # rounding of the stored features (tests/test_device_bank.py
        # asserts decode-identical spans on golden-sized shapes)
        gathered = gathered.astype(jnp.float32)
    batch['video_feat'] = gathered
    token_ids = batch['token_ids'].astype(jnp.int32)
    batch['sent_feat'] = jnp.take(emb, token_ids, axis=0)
    N = token_ids.shape[1]
    slen = batch['sent_len'].astype(jnp.int32)[:, None]
    batch['sent_mask'] = (jnp.arange(N, dtype=jnp.int32)[None, :]
                          <= slen).astype(jnp.int32)
    from ..ops.augment_device import device_masks
    T = feats.shape[1]
    masks = device_masks(batch['framestps'][:, 0].astype(jnp.int32),
                         batch['framestps'][:, 1].astype(jnp.int32),
                         batch['nfeats'].astype(jnp.int32), T)
    batch.update(masks)
    return batch


class DeviceFeatureBank:
    """HBM-resident copy of a feature pack + the GloVe embedding matrix."""

    # step factories take this directly: it is a pure function of the
    # batch (never a bound method capturing device arrays)
    assemble = staticmethod(assemble)

    def __init__(self, pack, vocab, mesh, chunk_bytes: int = 64 << 20,
                 dtype: str = 'raw'):
        self.bin_path = pack.bin_path
        sharding = replicated_sharding(mesh)
        from .featpack import HEADER_SIZE
        mm = np.memmap(pack.bin_path, dtype=pack.raw_dtype, mode='r',
                       offset=HEADER_SIZE,
                       shape=(pack.num_videos, pack.T, pack.D))
        self.scales = None
        if str(dtype).lower() == 'int8':
            # int8 tier (config: device_bank_dtype) — quarter of an f32
            # pack's upload/HBM, half of an f16 one (works for both, unlike
            # bf16 which only helps f32 packs): the 6.5 GiB ANet-CD c3d
            # bank becomes 1.65 GiB. Per-(video, frame) symmetric scales
            # ride along ([V, T] f32 — ~0.1% of the pack) and the gather
            # dequantizes on device.
            self.feats, self.scales = _upload_quantized(mm, sharding,
                                                        chunk_bytes)
            itemsize = 1
            scale_bytes = pack.num_videos * pack.T * 4
        else:
            convert = None
            if str(dtype).lower() == 'bf16' and pack.raw_dtype != np.float16:
                # bf16 tier — halves both the upload and the HBM residency
                # of f32 packs; conversion happens per upload chunk (never
                # a full-pack bf16 host copy) and assemble() widens the
                # per-batch gather back to f32. f16 packs are already
                # half-width — converting them to bf16 would only throw
                # away mantissa bits.
                import ml_dtypes
                convert = ml_dtypes.bfloat16
            self.feats = _upload_replicated(mm, sharding, chunk_bytes,
                                            convert=convert)
            itemsize = 2 if convert is not None else pack.raw_dtype.itemsize
            scale_bytes = 0
        emb = np.asarray(vocab.embeddings, np.float32)
        self.embeddings = _upload_replicated(emb, sharding, chunk_bytes)
        self.T = pack.T
        self.nbytes = (pack.num_videos * pack.T * pack.D * itemsize
                       + scale_bytes + int(emb.nbytes))

    def attach(self, device_batch: Dict[str, Any]) -> Dict[str, Any]:
        """Add the resident arrays to a device batch so they enter the
        jitted step as parameters (zero-copy: they are already committed
        device buffers with the right sharding)."""
        out = dict(device_batch)
        out[BANK_FEATS] = self.feats
        out[BANK_EMB] = self.embeddings
        if self.scales is not None:
            out[BANK_SCALE] = self.scales
        return out


_BANK_CACHE: Dict[Any, DeviceFeatureBank] = {}


def maybe_device_bank(params: Dict[str, Any], dataset, mesh,
                      logger=None) -> Optional[DeviceFeatureBank]:
    """Build (or reuse) a device bank for a dataset's feature pack when
    the configuration allows it. Returns None when:

    - the dataset has no packed source (per-file .npy/hdf5 stores),
    - host-side augmentation needs the features on host (`if_aug`),
    - the pack exceeds the HBM budget (`device_bank_max_gb`),
    - or `device_bank` is disabled in config.

    The budget is CUMULATIVE over every bank already resident (the cache
    never evicts): two distinct 6.5 GiB packs each under an 8 GiB budget
    would otherwise both pass individually and jointly OOM the chip.
    """
    if not params.get('device_bank', True):
        return None
    pack = getattr(dataset, 'pack', None)
    if pack is None:
        return None
    if dataset.is_train and bool(params.get('if_aug', False)):
        return None  # host aug_data mutates features before masking
    bank_dtype = str(params.get('device_bank_dtype', 'raw')).lower()
    max_bytes = float(params.get('device_bank_max_gb', 8.0)) * 2 ** 30
    itemsize = pack.raw_dtype.itemsize
    scale_bytes = 0
    if bank_dtype == 'int8':
        itemsize = 1
        scale_bytes = pack.num_videos * pack.T * 4
    elif bank_dtype == 'bf16' and pack.raw_dtype != np.float16:
        itemsize = 2
    nbytes = pack.num_videos * pack.T * pack.D * itemsize + scale_bytes
    resident = sum(b.nbytes for k, b in _BANK_CACHE.items()
                   if k[0] != pack.bin_path)
    if nbytes + resident > max_bytes:
        if logger is not None:
            logger.warning('device bank disabled: pack is %.2f GiB and '
                           '%.2f GiB of banks are already resident > '
                           'device_bank_max_gb=%.1f', nbytes / 2 ** 30,
                           resident / 2 ** 30,
                           params.get('device_bank_max_gb', 8.0))
        return None
    # key by device identity, not id(mesh): a GC'd mesh's id can be
    # reused by a new object, which would alias distinct meshes
    cache_key = (pack.bin_path, bank_dtype,
                 tuple(d.id for d in mesh.devices.flat))
    bank = _BANK_CACHE.get(cache_key)
    if bank is None:
        bank = DeviceFeatureBank(pack, dataset.vocab, mesh,
                                 dtype=bank_dtype)
        _BANK_CACHE[cache_key] = bank
        if logger is not None:
            logger.info('device feature bank resident: %s (%.2f GiB in HBM)',
                        pack.bin_path, bank.nbytes / 2 ** 30)
    return bank
