"""On-device 6-reading-frame codon encoding.

TPU-first redesign of the reference's string preprocessing
(``seqops/encode.py:65-318``): the host ships raw base IDs (1 byte/base,
nibble-packable, see :mod:`jaeger_tpu.seqops.windows`), and the codon
translation — case folding, reverse complement, trigram->codon mapping,
frame slicing, mask computation — runs inside the jitted model as pure
**arithmetic** (bit tricks; the classical codon-table order is a 2-bit
permutation of the base IDs) plus static slices: no per-element table
gathers, which are TPU-hostile. This removes the tf.data string pipeline
(the reference's documented host bottleneck) and cuts host->device
transfer ~8-32x vs shipping int32 frame tokens.

Semantics parity (pinned by tests against a literal numpy oracle):

* base IDs A=0 T=1 G=2 C=3 N=4 (reference ``encode.py:326-338``);
* codon IDs in classical table order, N-containing trigram -> -1;
* frame f takes trigrams ``f, f+3, ...``; every frame yields exactly
  ``K = ceil((m - 5 + offset)/3)`` positions, ``offset =
  [-2,-1,0][crop % 3]`` (reference ``encode.py:157-162``,
  ``crop.py:44-61``);
* tokens are ``codon_id + 1`` so 0 doubles as pad/ambiguous = masked.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jaeger_tpu.seqops import crop as crop_contract
from jaeger_tpu.seqops import maps

#: complement in base-ID space (A<->T, G<->C, N->N)
_COMPLEMENT = np.array([1, 0, 3, 2, 4], dtype=np.int32)

#: base-ID -> nucleotide-branch ID (A=0, G=1, C=2, T=3, N=-1),
#: reference ``encode.py:36-41``.
_NUC_ID = np.array([0, 3, 1, 2, -1], dtype=np.int32)


@functools.lru_cache(maxsize=8)
def codon_table(alphabet: str = "CODON") -> np.ndarray:
    """Flat (125,) trigram -> codon-class table in base-ID space.

    Index is ``b0*25 + b1*5 + b2``; any trigram containing N maps to -1.
    """
    codons, codon_ids = maps.resolve_alphabet(alphabet)
    bases = "ATGCN"
    lut = np.full(125, -1, dtype=np.int32)
    codon_to_id = {c: i for c, i in zip(codons, codon_ids)}
    for i0 in range(4):
        for i1 in range(4):
            for i2 in range(4):
                tri = bases[i0] + bases[i1] + bases[i2]
                cid = codon_to_id.get(tri)
                if cid is not None:
                    lut[i0 * 25 + i1 * 5 + i2] = cid
    return lut


def frame_positions(crop_size: int) -> int:
    """Static per-frame token count K for a given nucleotide crop."""
    return crop_contract.frame_length(crop_size, crop_size)


def _codon_ids_arith(b: jnp.ndarray) -> jnp.ndarray:
    """(B, L) base IDs -> (B, L-2) classical-table codon IDs, arithmetic.

    The classical codon-table order (middle base slowest over TCAG) makes
    the codon ID ``16*g(b1) + 4*g(b0) + g(b2)`` where ``g`` permutes our
    base IDs (A0 T1 G2 C3) into TCAG positions — a 2-bit swap+flip:
    ``g(b) = ((b & 1) ^ 1) * 2 + (b >> 1)``. This removes the per-element
    table gather (TPU-hostile) from the hot encode path entirely.
    Ambiguous bases (id >= 4) make the codon -1.
    """
    g = ((b & 1) ^ 1) * 2 + (b >> 1)
    b0, b1, b2 = b[:, :-2], b[:, 1:-1], b[:, 2:]
    g0, g1, g2 = g[:, :-2], g[:, 1:-1], g[:, 2:]
    cid = 16 * g1 + 4 * g0 + g2
    valid = (b0 < 4) & (b1 < 4) & (b2 < 4)
    return jnp.where(valid, cid, -1)


def _trigram_codons(b: jnp.ndarray, alphabet: str) -> jnp.ndarray:
    """(B, L) base IDs -> (B, L-2) codon class IDs (-1 for ambiguous)."""
    cid = _codon_ids_arith(b)
    if alphabet.upper() in ("CODON", "CODON_ID"):
        return cid
    # reduced alphabets remap through a 64-entry table (tiny gather)
    _, ids = maps.resolve_alphabet(alphabet)
    lut64 = jnp.asarray(list(ids), dtype=jnp.int32)
    return jnp.where(cid >= 0, jnp.take(lut64, jnp.maximum(cid, 0)), -1)


def _frames_from_codons(codons: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, L-2) codons -> (B, 3, K) frames via static strided slices."""
    f = [codons[:, off::3][:, :k] for off in range(3)]
    # guard: short crops can yield fewer than K positions in a slice
    f = [
        jnp.pad(x, ((0, 0), (0, k - x.shape[1]))) if x.shape[1] < k else x
        for x in f
    ]
    return jnp.stack(f, axis=1)


def dense_window_rows(bases: np.ndarray, lengths: np.ndarray,
                      crop_nt: int,
                      masking_enabled: bool = True) -> np.ndarray:
    """Per-row dense predicate: row i is True when the maskless
    (``assume_dense``) program is exact for window i — it fills the
    model's crop and no base encodes to a masked token. Base IDs: 0-3
    ACGT, 4 N, 5-8 soft-masked lowercase (which encode to their
    uppercase base when the model's ``masking`` flag is off)."""
    if bases.shape[1] < crop_nt:
        return np.zeros(bases.shape[0], bool)
    window = bases[:, :crop_nt]
    ok = np.asarray(lengths) >= crop_nt
    if masking_enabled:
        return ok & (window.max(axis=1) < 4)
    return ok & ~(window == 4).any(axis=1)


def _run_stats(cod: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(interior_max, edge_max) True-run lengths per row of (N, K)."""
    n, K = cod.shape
    cs = np.cumsum(cod, axis=1)
    last = np.maximum.accumulate(np.where(~cod, cs, 0), axis=1)
    runlen = np.where(cod, cs - last, 0)
    has_false = ~cod.all(axis=1)
    lead = np.where(cod[:, 0],
                    np.where(has_false, np.argmin(cod, axis=1), K), 0)
    rev = cod[:, ::-1]
    trail = np.where(cod[:, -1],
                     np.where(has_false, np.argmin(rev, axis=1), K), 0)
    pos = np.arange(K)[None, :]
    interior = np.where(
        (pos >= lead[:, None]) & (pos < K - trail[:, None]), runlen, 0
    ).max(axis=1)
    return interior, np.maximum(lead, trail)


def bounded_mask_levels(bases: np.ndarray, lengths: np.ndarray,
                        crop_nt: int, masking_enabled: bool,
                        plans) -> np.ndarray:
    """Per-row earliest qualifying bounded-mask cut, or -1.

    ``plans`` is ``builder.mask_cut_plan``'s list: row i qualifies for
    plan p when every invalid run not touching a window edge is at most
    ``p[1]`` codons and every edge-touching run at most ``p[2]`` —
    any-mode mask growth then provably clears the mask by that cut
    (invalid runs only ever shrink, each conv by at least its accounted
    span, because every output position is its own center tap; they can
    never merge or grow).

    Mirrors :func:`encode_frames`' token-0 semantics exactly: base IDs
    >= 4 (>= masking, else only N/padding), the crop-contract
    ``p_valid`` tail cutoff, and the reverse-complement frames (their
    runs are the forward runs mirrored over the valid prefix, then
    right-padded invalid).
    """
    from jaeger_tpu.seqops import crop as crop_contract

    n = bases.shape[0]
    C = int(crop_nt)
    if bases.shape[1] < C:
        return np.full(n, -1, np.int64)
    b = np.asarray(bases[:, :C])
    m = np.minimum(np.asarray(lengths, np.int64), C)
    if masking_enabled:
        bad = b >= 4
    else:
        bad = b == 4
    pos = np.arange(C)[None, :]
    bad = bad | (pos >= m[:, None])
    K = frame_positions(C)
    offset = crop_contract.OFFSET_LUT[C % 3]
    p_valid = np.maximum(0, -((-(m - 5 + offset)) // 3))
    tail = np.arange(K)[None, :] >= p_valid[:, None]
    # rc stream: reverse of bad over the valid prefix, right-padded True
    idx = m[:, None] - 1 - pos
    rc_bad = np.where(
        idx >= 0, np.take_along_axis(bad, np.clip(idx, 0, C - 1), axis=1),
        True,
    )
    interior = np.zeros(n, np.int64)
    edge = np.zeros(n, np.int64)
    for src in (bad, rc_bad):
        for o in range(3):
            seg = src[:, o:o + 3 * K]
            if seg.shape[1] < 3 * K:
                seg = np.pad(seg, ((0, 0), (0, 3 * K - seg.shape[1])),
                             constant_values=True)
            cod = seg.reshape(n, K, 3).any(axis=2) | tail
            i_max, e_max = _run_stats(cod)
            interior = np.maximum(interior, i_max)
            edge = np.maximum(edge, e_max)
    level = np.full(n, -1, np.int64)
    for p_idx in reversed(range(len(plans))):
        _, i_bound, e_bound = plans[p_idx]
        level = np.where((interior <= i_bound) & (edge <= e_bound),
                         p_idx, level)
    return level


def bounded_mask_rows(bases: np.ndarray, lengths: np.ndarray,
                      crop_nt: int, masking_enabled: bool,
                      max_run: int) -> np.ndarray:
    """Single-bound predicate (conservative: interior and edge runs both
    held to ``max_run``); see :func:`bounded_mask_levels`."""
    level = bounded_mask_levels(bases, lengths, crop_nt, masking_enabled,
                                [(None, max_run, max_run)])
    return level == 0


def dense_window_batch(bases: np.ndarray, lengths: np.ndarray,
                       crop_nt: int, masking_enabled: bool = True) -> bool:
    """Whole-batch dense predicate (see :func:`dense_window_rows`).
    Shared by the inference engine's per-batch program selection and the
    train loop's dense-step dispatch."""
    if np.asarray(lengths).size == 0:
        return False
    return bool(dense_window_rows(bases, lengths, crop_nt,
                                  masking_enabled).all())


def pack_bases(bases: np.ndarray) -> np.ndarray:
    """Pack base IDs two-per-byte (4-bit nibbles) for host->device
    transfer. Halves PCIe/interconnect bytes; exact for the 9-symbol
    alphabet. Pads odd lengths with N."""
    n, L = bases.shape
    if L % 2:
        bases = np.pad(bases, ((0, 0), (0, 1)), constant_values=4)
        L += 1
    b = bases.astype(np.uint8)
    return (b[:, 0::2] | (b[:, 1::2] << 4)).astype(np.uint8)


def unpack_bases(packed: jnp.ndarray, length: int) -> jnp.ndarray:
    """Device-side inverse of :func:`pack_bases` -> (N, length) uint8."""
    lo = packed & 0x0F
    hi = packed >> 4
    out = jnp.stack([lo, hi], axis=-1).reshape(packed.shape[0], -1)
    return out[:, :length]


@functools.partial(
    jax.jit, static_argnames=("crop_size", "masking", "alphabet")
)
def encode_frames(
    bases: jnp.ndarray,
    lengths: jnp.ndarray,
    crop_size: int,
    masking: bool = False,
    alphabet: str = "CODON",
) -> jnp.ndarray:
    """Encode base IDs to 6-frame codon tokens.

    Args:
        bases: (B, >=crop_size) uint8 base IDs (9-symbol alphabet with
            lowercase soft-mask variants).
        lengths: (B,) int32 — valid bases per window.
        crop_size: nucleotide crop C (use
            :func:`jaeger_tpu.seqops.crop.codons_to_nucleotides` to derive
            from a codon crop).
        masking: when True, soft-masked (lowercase) bases are treated as
            ambiguous, matching the reference's ``masking: true`` configs.

    Returns:
        (B, 6, K) int32 tokens; 0 = pad/ambiguous (masked), 1..depth = codon
        class + 1. Frame order f1,f2,f3,r1,r2,r3.
    """
    C = int(crop_size)
    k = frame_positions(C)

    raw = bases[:, :C].astype(jnp.int32)
    # case folding by arithmetic (no table gathers — TPU-hostile):
    # lowercase ids 5-8 fold to 0-3 (masking off) or to N=4 (masking on)
    if masking:
        b = jnp.where(raw >= 4, 4, raw)
    else:
        b = jnp.where(raw >= 5, raw - 5, raw)
    m = jnp.minimum(lengths.astype(jnp.int32), C)  # valid bases in the crop

    # reverse-complement of the *valid* prefix, re-padded with N on the
    # right. complement is pure arithmetic (A<->T, G<->C is id XOR 1);
    # the per-window reversal is a contiguous dynamic slice out of
    # [flip(comp), N-pad] instead of an elementwise gather.
    comp_b = jnp.where(b < 4, b ^ 1, 4)
    buf = jnp.concatenate(
        [jnp.flip(comp_b, axis=1), jnp.full((b.shape[0], C), 4, b.dtype)],
        axis=1,
    )
    rb = jax.vmap(
        lambda row, start: jax.lax.dynamic_slice(row, (start,), (C,))
    )(buf, C - m)

    fwd = _frames_from_codons(_trigram_codons(b, alphabet), k)
    rev = _frames_from_codons(_trigram_codons(rb, alphabet), k)
    frames = jnp.concatenate([fwd, rev], axis=1)  # (B, 6, K)

    # per-window valid frame positions: P = ceil((m - 5 + offset) / 3)
    offset = crop_contract.OFFSET_LUT[C % 3]
    p_valid = jnp.maximum(0, -((-(m - 5 + offset)) // 3))
    valid = jnp.arange(k, dtype=jnp.int32)[None, None, :] < p_valid[:, None, None]

    tokens = (frames + 1) * valid.astype(jnp.int32)
    return tokens


@functools.partial(jax.jit, static_argnames=("crop_size", "masking"))
def encode_nucleotide(
    bases: jnp.ndarray,
    lengths: jnp.ndarray,
    crop_size: int,
    masking: bool = False,
) -> jnp.ndarray:
    """Encode base IDs to the 2-strand one-hot nucleotide input.

    Returns (B, 2, C, 4) float32 one-hot in A,G,C,T channel order
    (reference ``encode.py:36-41,143-147``); ambiguous bases and padding
    are all-zero rows (masked by the model's input Masking semantics).
    """
    C = int(crop_size)
    nuc = jnp.asarray(_NUC_ID)

    raw = bases[:, :C].astype(jnp.int32)
    if masking:
        b = jnp.where(raw >= 4, 4, raw)
    else:
        b = jnp.where(raw >= 5, raw - 5, raw)
    m = jnp.minimum(lengths.astype(jnp.int32), C)
    pos = jnp.arange(C, dtype=jnp.int32)[None, :]
    valid = pos < m[:, None]
    b = jnp.where(valid, b, 4)

    comp_b = jnp.where(b < 4, b ^ 1, 4)
    buf = jnp.concatenate(
        [jnp.flip(comp_b, axis=1), jnp.full((b.shape[0], C), 4, b.dtype)],
        axis=1,
    )
    rb = jax.vmap(
        lambda row, start: jax.lax.dynamic_slice(row, (start,), (C,))
    )(buf, C - m)

    ids = jnp.stack([jnp.take(nuc, b, axis=0), jnp.take(nuc, rb, axis=0)], axis=1)
    return jax.nn.one_hot(ids, 4, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# Literal numpy oracle of the reference TF string path — tests only.
# ---------------------------------------------------------------------------

_COMP_CHAR = {"A": "T", "T": "A", "G": "C", "C": "G",
              "a": "t", "t": "a", "g": "c", "c": "g"}


def encode_frames_oracle(
    seq: str,
    crop_size: int,
    masking: bool = False,
    alphabet: str = "CODON",
) -> np.ndarray:
    """Replicates ``process_string_inference`` string ops literally.

    Byte-splits, reverse-complements via the character table (default 'N'),
    takes character trigrams, slices the 6 frames with the negative-stop
    arithmetic, looks up codons (default -1), and returns tokens ``+1``.
    Output shape (6, P) with P the frame length the TF path would produce.
    """
    codons, codon_ids = maps.resolve_alphabet(alphabet)
    table = {c: i for c, i in zip(codons, codon_ids)}
    offset = crop_contract.OFFSET_LUT[crop_size % 3]
    fwd = list(seq[:crop_size])
    rev = [_COMP_CHAR.get(ch, "N") for ch in fwd[::-1]]
    if not masking:
        fwd = [ch.upper() for ch in fwd]
        rev = [ch.upper() for ch in rev]

    def tri(strand: list[str]) -> list[str]:
        return ["".join(strand[i : i + 3]) for i in range(len(strand) - 2)]

    def look(grams: list[str]) -> np.ndarray:
        return np.array([table.get(g, -1) for g in grams], dtype=np.int32)

    tf_, tr_ = tri(fwd), tri(rev)
    stops = [-3 + offset, -2 + offset, -1 + offset]
    frames = []
    for src in (tf_, tr_):
        for f in range(3):
            stop = stops[f]
            sl = src[f:stop:3] if stop != 0 else src[f::3]
            frames.append(look(sl))
    n = min(len(fr) for fr in frames)
    return np.stack([fr[:n] for fr in frames], axis=0) + 1
