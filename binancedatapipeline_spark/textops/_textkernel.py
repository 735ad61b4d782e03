"""Byte-level NumPy kernels behind the text projections' Arrow path.

The token/char-class counts in :mod:`textops.analysis` have exact
closed forms (pinned by adversarial differential since round 12):
every one of them is a function of ASCII byte classes over the raw
UTF-8 buffer —

- Java's ``\\s`` with no UNICODE flag is exactly the six ASCII bytes
  ``[ \\t\\n\\x0B\\f\\r]``; ``\\w`` is ``[A-Za-z0-9_]``; ``[A-Za-z]``
  and ``\\d`` are ASCII. None of these bytes can appear inside a
  multi-byte UTF-8 sequence (continuation bytes are >= 0x80), so a
  "run of ``\\S`` characters" is exactly a run of non-ws *bytes*.
- A codepoint count (Spark ``length()``, or a negated class like
  ``[^\\w\\s]`` which matches every non-ASCII codepoint) is the count
  of non-continuation bytes (``b & 0xC0 != 0x80``).

So one pass of table lookups + segmented cumulative sums over the
Arrow string buffer reproduces the counts integer-for-integer at
memory bandwidth, with zero per-row JVM regex work (guide §4.2: hand
whole batches to vectorized native code). The JVM column-expression
forms in analysis.py stay the default — these kernels are the opt-in
``kernel="arrow"`` path for bulk scoring queries, same contract as
similarity.py's Arrow scorers.

Float arithmetic (quality ratios/score) deliberately does NOT happen
here: the Arrow path emits the integer counts and the caller applies
the same JVM column expressions as the default path, so double
semantics are shared by construction.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- classes
# Byte-class lookup tables (one bool per byte value).
_WS = np.zeros(256, dtype=bool)
_WS[[0x20, 0x09, 0x0A, 0x0B, 0x0C, 0x0D]] = True  # java \s, ASCII-only
_NSW = _WS.copy()
_NSW[0x20] = False  # java \s minus the space trim() strips
_ALPHA = np.zeros(256, dtype=bool)
_ALPHA[ord("A") : ord("Z") + 1] = True
_ALPHA[ord("a") : ord("z") + 1] = True
_DIGIT = np.zeros(256, dtype=bool)
_DIGIT[ord("0") : ord("9") + 1] = True
_WORD = _ALPHA | _DIGIT
_WORD[ord("_")] = True
# non-continuation bytes start a codepoint: b & 0xC0 != 0x80
_CP_START = np.array([(b & 0xC0) != 0x80 for b in range(256)], dtype=bool)


def _string_buffer(arr):
    """(seg, offs) for a pyarrow string/large_string Array: the UTF-8
    byte window this array covers and int64 offsets rebased into it.
    Handles sliced arrays (non-zero ``arr.offset``) and both offset
    widths."""
    import pyarrow as pa

    n = len(arr)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.zeros(0, dtype=np.uint8)
    )
    lo = offs[0] if n else 0
    seg = data[lo : offs[-1]] if n else data[:0]
    return seg, offs - lo


def _rowsum(mask: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-row count of True bytes, via one cumulative sum (immune to
    np.add.reduceat's empty-segment quirk)."""
    c = np.zeros(len(mask) + 1, dtype=np.int64)
    np.cumsum(mask, out=c[1:])
    return c[offs[1:]] - c[offs[:-1]]


def _run_starts(mask: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Start-of-maximal-run marker for ``mask``, with row boundaries
    respected: position p starts a run iff mask[p] and (p is its row's
    first byte or mask[p-1] is False)."""
    starts = np.empty_like(mask)
    if len(mask):
        starts[0] = mask[0]
        np.logical_and(mask[1:], ~mask[:-1], out=starts[1:])
        rs = offs[:-1]
        rs = rs[rs < len(mask)]
        starts[rs] = mask[rs]
    return starts


def text_counts(arr) -> dict[str, np.ndarray]:
    """All closed-form counts for one Arrow string array, as int64
    numpy arrays (callers mask nulls themselves):

    - ``n_tokens``  — size(split(trim(collapse(\\s+)), ' ')): the
      number of ``\\S+`` runs, floored at 1 (empty/ws-only text → 1,
      the split('')→[''] artifact).
    - ``n_bpe_ish`` — size(split(trim(pad punct/digits), '\\s+'))
      including the trim-only-strips-0x20 phantom-segment quirk.
    - ``n_chars``   — length(): codepoint count.
    - ``n_punct``   — codepoints matching ``[^\\w\\s]``.
    - ``n_alpha``   — bytes matching ``[A-Za-z]``.
    """
    seg, offs = _string_buffer(arr)
    ws = _WS[seg]
    nonws = ~ws
    alpha = _ALPHA[seg]
    digit = _DIGIT[seg]
    cp = _CP_START[seg]
    nsw = _NSW[seg]

    n_cp = _rowsum(cp, offs)
    n_alpha_b = _rowsum(alpha, offs)
    n_digit_b = _rowsum(digit, offs)
    n_ws_b = _rowsum(ws, offs)
    n_word_b = _rowsum(_WORD[seg], offs)

    n_tok_runs = _rowsum(_run_starts(nonws, offs), offs)
    n_tokens = np.maximum(n_tok_runs, 1)

    # pieces = alpha runs + digit runs + every other non-ws codepoint
    p = (
        _rowsum(_run_starts(alpha, offs), offs)
        + _rowsum(_run_starts(digit, offs), offs)
        + (n_cp - n_alpha_b - n_digit_b - n_ws_b)
    )
    # phantom empty segments: split('\s+') after a trim that strips
    # ONLY 0x20 keeps one empty piece per side whose outermost
    # non-space whitespace survives trim (^ *[\t\n\x0B\f\r], and
    # mirrored at the end)
    notspace = seg != 0x20
    idx = np.flatnonzero(notspace)
    nrows = len(offs) - 1
    lead = np.zeros(nrows, dtype=np.int64)
    trail = np.zeros(nrows, dtype=np.int64)
    if idx.size:
        k1 = np.searchsorted(idx, offs[:-1], side="left")
        k2 = np.searchsorted(idx, offs[1:], side="left") - 1
        has = k1 <= k2
        first = idx[np.minimum(k1, idx.size - 1)]
        last = idx[np.maximum(k2, 0)]
        lead[has] = _NSW[seg[first[has]]]
        trail[has] = _NSW[seg[last[has]]]
    has_nsw = _rowsum(nsw, offs) > 0
    n_bpe = np.where(p == 0, np.where(has_nsw, 2, 1), p + lead + trail)

    return {
        "n_tokens": n_tokens,
        "n_bpe_ish": n_bpe,
        "n_chars": n_cp,
        "n_punct": n_cp - n_word_b - n_ws_b,
        "n_alpha": n_alpha_b,
    }


# ------------------------------------------------------------- lang guess


def _pack_token(bs: bytes, maxlen: int) -> int:
    """(bytes, length) packed into one uint64: bytes little-endian in
    the low ``8*maxlen`` bits, length above them. Tokens longer than
    ``maxlen`` never match any marker and are filtered before packing,
    so the packing is injective over candidates — including tokens
    containing NUL bytes (the explicit length disambiguates them from
    zero padding)."""
    v = 0
    for j, b in enumerate(bs):
        v |= b << (8 * j)
    return v | (len(bs) << (8 * maxlen))


def marker_tables(markers: dict[str, tuple[str, ...]]):
    """Driver-side prep shared with the kernel: sorted language names,
    packed marker keys sorted for searchsorted, their language ids,
    and the max marker byte length."""
    langs = sorted(markers)
    enc: list[tuple[int, int]] = []
    maxlen = max(
        len(m.encode("utf-8")) for ms in markers.values() for m in ms
    )
    if 8 * (maxlen + 1) > 64:
        raise ValueError(f"marker byte length {maxlen} too wide to pack")
    for li, lang in enumerate(langs):
        for m in markers[lang]:
            enc.append((_pack_token(m.encode("utf-8"), maxlen), li))
    enc.sort()
    keys = np.array([k for k, _ in enc], dtype=np.uint64)
    lids = np.array([li for _, li in enc], dtype=np.int64)
    return langs, keys, lids, maxlen


def lang_guess_counts(
    arr, keys: np.ndarray, lids: np.ndarray, maxlen: int, n_langs: int
) -> np.ndarray:
    """(rows, n_langs) marker-hit counts for one Arrow string array:
    whitespace tokens (identical boundaries to the JVM form — ASCII
    case-lowering never creates or destroys ``\\s`` bytes) matched
    whole against the packed marker set after ASCII lowercasing.

    ASCII-only lowering is exact here: the only Unicode uppercase
    codepoint whose ROOT-locale lowercase is a pure-ASCII string is
    U+212A KELVIN SIGN → 'k', and no marker contains 'k'; every other
    non-ASCII mapping yields non-ASCII (or multi-codepoint) output
    that can never equal an ASCII marker on either path. Pinned by
    differential test against the JVM filter form."""
    seg, offs = _string_buffer(arr)
    nrows = len(offs) - 1
    counts = np.zeros((nrows, n_langs), dtype=np.int64)
    if not len(seg):
        return counts
    ws = _WS[seg]
    nonws = ~ws
    starts_mask = _run_starts(nonws, offs)
    # run ends: nonws byte whose successor (within the row) is ws/eor
    ends_mask = np.empty_like(nonws)
    ends_mask[-1] = nonws[-1]
    np.logical_and(nonws[:-1], ws[1:], out=ends_mask[:-1])
    re_ = offs[1:] - 1
    re_ = re_[re_ >= 0]
    ends_mask[re_] = nonws[re_]
    starts = np.flatnonzero(starts_mask)
    ends = np.flatnonzero(ends_mask)
    if not starts.size:
        return counts
    lengths = ends - starts + 1
    cand = np.flatnonzero(lengths <= maxlen)
    if not cand.size:
        return counts
    st = starts[cand]
    ln = lengths[cand]
    low = seg.copy()
    up = (seg >= 0x41) & (seg <= 0x5A)
    low[up] += 0x20
    key = np.zeros(cand.size, dtype=np.uint64)
    for j in range(maxlen):
        m = ln > j
        b = np.zeros(cand.size, dtype=np.uint64)
        b[m] = low[st[m] + j]
        key |= b << np.uint64(8 * j)
    key |= ln.astype(np.uint64) << np.uint64(8 * maxlen)
    pos = np.searchsorted(keys, key)
    pos_c = np.minimum(pos, keys.size - 1)
    hit = keys[pos_c] == key
    if not hit.any():
        return counts
    st_hit = st[hit]
    row_of = np.searchsorted(offs, st_hit, side="right") - 1
    lang_of = lids[pos_c[hit]]
    flat = np.bincount(row_of * n_langs + lang_of, minlength=nrows * n_langs)
    return flat.reshape(nrows, n_langs)
