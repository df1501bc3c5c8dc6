"""PPMd variant H (PPMd7) — native decoder for 7z PPMd folders and RAR3
PPM blocks.

The model is Dmitry Shkarin's PPMd var.H as fixed by the public-domain
Ppmd7 reference semantics (7-Zip / libarchive both ship independent
implementations of the same model; the 7z coder id is 030401, and RAR3
"PPM blocks" use the identical model under a different — carryless —
range coder, which is why 7-Zip's Rar3 decoder reuses Ppmd7 with its
"7a" range decoder).

Two entropy-coder front-ends over one model:
- :class:`Ppmd7zRangeDec` — the 7z range decoder (leading zero byte +
  4 code bytes, top-value renormalisation).
- :class:`PpmdRarRangeDec` — the RAR3 carryless range coder
  (low/code/range, BOT/TOP renormalisation with 32-bit wraparound).

Validated in tests/test_ppmd.py against 7z PPMd archives produced by the
in-container bsdtar (libarchive) across sizes/orders, CRC-checked.

Memory model: the reference implementation sub-allocates from one byte
pool and restarts the model when the pool fills.  Here contexts/states
are Python objects with a unit-accounting shadow (same unit geometry:
12-byte units, states 2-per-unit), so restart triggers at the same fill
level for the text area (exact) and at an equivalent level for units
(approximate: no fragmentation).  All test corpora stay far below the
pool size, where behaviour is bit-exact.
"""

from __future__ import annotations

from typing import List, Optional, Union

MAX_FREQ = 124
INT_BITS = 7
PERIOD_BITS = 7
BIN_SCALE = 1 << (INT_BITS + PERIOD_BITS)  # 16384
UNIT_SIZE = 12
K_TOP = 1 << 24
K_BOT = 1 << 15
MASK32 = 0xFFFFFFFF

K_INIT_BIN_ESC = (0x3CDD, 0x1F3F, 0x59BF, 0x48F3, 0x64A1, 0x5ABC, 0x6632, 0x6051)
K_EXP_ESCAPE = (25, 14, 9, 7, 5, 5, 4, 4, 4, 3, 3, 3, 2, 2, 2, 2)


def _get_mean(summ: int) -> int:
    # PPMD_GET_MEAN_SPEC(summ, PERIOD_BITS, 2)
    return (summ + (1 << (PERIOD_BITS - 2))) >> PERIOD_BITS


class PpmdError(ValueError):
    pass


# ------------------------------------------------------------ structures


class _State:
    __slots__ = ("symbol", "freq", "successor")

    def __init__(self, symbol: int = 0, freq: int = 0, successor=None) -> None:
        self.symbol = symbol
        self.freq = freq
        # successor: None | int (text offset, "not yet a context") | _Ctx
        self.successor = successor

    def copy(self) -> "_State":
        return _State(self.symbol, self.freq, self.successor)


class _Ctx:
    __slots__ = ("stats", "summ_freq", "suffix")

    def __init__(self) -> None:
        self.stats: List[_State] = []
        self.summ_freq = 0
        self.suffix: Optional[_Ctx] = None

    @property
    def num_stats(self) -> int:
        return len(self.stats)

    def one_state(self) -> _State:
        return self.stats[0]


class _See:
    __slots__ = ("summ", "shift", "count")

    def __init__(self, summ: int = 0, shift: int = PERIOD_BITS, count: int = 64) -> None:
        self.summ = summ
        self.shift = shift
        self.count = count

    def mean(self) -> int:
        r = self.summ >> self.shift
        self.summ = (self.summ - r) & 0xFFFF
        return r + (1 if r == 0 else 0)

    def update(self) -> None:
        if self.shift < PERIOD_BITS:
            self.count -= 1
            if self.count == 0:
                self.summ = (self.summ << 1) & 0xFFFF
                self.count = 3 << self.shift
                self.shift += 1


def _units(num_states: int) -> int:
    """Units consumed by a stats array of the given capacity (2 states/unit)."""
    return (num_states + 1) >> 1


# -------------------------------------------------------------- the model


class Ppmd7:
    def __init__(self, max_order: int, mem_bytes: int) -> None:
        if not (2 <= max_order <= 64):
            raise PpmdError(f"bad PPMd order {max_order}")
        self.max_order = max_order
        self.size = max(mem_bytes, 1 << 16)
        # reference geometry: UnitsStart = HiUnit - Size/8/12*7*12 —
        # i.e. 7/8 of the pool (rounded to units) is the unit area, the
        # rest is the text area
        self.units_total = (self.size // 8 // UNIT_SIZE) * 7
        self.text_limit = self.size - self.units_total * UNIT_SIZE
        # tables (Ppmd7_Construct)
        self.ns2bs_indx = bytearray(256)
        self.ns2bs_indx[0] = 0
        self.ns2bs_indx[1] = 2
        for i in range(2, 11):
            self.ns2bs_indx[i] = 4
        for i in range(11, 256):
            self.ns2bs_indx[i] = 6
        self.ns2_indx = bytearray(256)
        for i in range(3):
            self.ns2_indx[i] = i
        m, k = 3, 1
        for i in range(3, 256):
            self.ns2_indx[i] = m
            k -= 1
            if k == 0:
                m += 1
                k = m - 2
        self.hb2_flag = bytearray(256)
        for i in range(0x40, 0x100):
            self.hb2_flag[i] = 8
        self.dummy_see = _See(0, PERIOD_BITS, 64)
        self.restart()

    # ----------------------------------------------------------- restart

    def restart(self) -> None:
        self.text = bytearray()
        self.units_used = 0
        self.glue_count = 0
        self.order_fall = self.max_order
        self.init_rl = -(self.max_order if self.max_order < 12 else 12) - 1
        self.run_length = self.init_rl
        self.prev_success = 0
        self.hi_bits_flag = 0
        self.init_esc = 0
        root = _Ctx()
        self.units_used += 1 + _units(256)
        root.summ_freq = 256 + 1
        root.stats = [_State(i, 1, None) for i in range(256)]
        self.min_context = self.max_context = root
        self.found_state = root.stats[0]
        self.bin_summ = [
            [BIN_SCALE - K_INIT_BIN_ESC[k & 7] // (i + 2) for k in range(64)]
            for i in range(128)
        ]
        self.see = [
            [_See((5 * i + 10) << (PERIOD_BITS - 4), PERIOD_BITS - 4, 4) for _ in range(16)]
            for i in range(25)
        ]

    # --------------------------------------------------------- allocation

    def _alloc(self, units: int) -> bool:
        if self.units_used + units > self.units_total:
            return False
        self.units_used += units
        return True

    def _free(self, units: int) -> None:
        self.units_used -= units

    # ------------------------------------------------------ model updates

    def _swap_to_front_neighbor(self, stats: List[_State], idx: int) -> int:
        stats[idx - 1], stats[idx] = stats[idx], stats[idx - 1]
        return idx - 1

    def _rescale(self) -> None:
        mc = self.min_context
        stats = mc.stats
        # move found state to front
        idx = stats.index(self.found_state)
        if idx != 0:
            stats.insert(0, stats.pop(idx))
        s = stats[0]
        esc_freq = mc.summ_freq - s.freq
        s.freq += 4
        adder = 1 if self.order_fall != 0 else 0
        s.freq = (s.freq + adder) >> 1
        sum_freq = s.freq
        for i in range(1, len(stats)):
            s = stats[i]
            esc_freq -= s.freq
            s.freq = (s.freq + adder) >> 1
            sum_freq += s.freq
            # insertion sort by freq (descending, stable for equal)
            j = i
            while j > 0 and stats[j].freq > stats[j - 1].freq:
                stats[j - 1], stats[j] = stats[j], stats[j - 1]
                j -= 1
        if stats[-1].freq == 0:
            i = 0
            while stats[-1 - i].freq == 0:
                i += 1
            esc_freq += i
            old_num = len(stats)
            del stats[old_num - i :]
            if len(stats) == 1:
                tmp = stats[0]
                while True:
                    tmp.freq -= tmp.freq >> 1
                    esc_freq >>= 1
                    if esc_freq <= 1:
                        break
                self._free(_units(old_num))
                # context collapses to a single embedded state
                self.found_state = mc.stats[0]
                return
            n0 = _units(old_num)
            n1 = _units(len(stats))
            if n0 != n1:
                self._free(n0 - n1)
        mc.summ_freq = sum_freq + esc_freq - (esc_freq >> 1)
        self.found_state = mc.stats[0]

    def _create_successors(self, skip: bool) -> Optional[_Ctx]:
        c = self.min_context
        up_branch = self.found_state.successor  # text offset
        ps: List[_State] = []
        if not skip:
            ps.append(self.found_state)
        while c.suffix is not None:
            c = c.suffix
            if c.num_stats != 1:
                s = None
                for st in c.stats:
                    if st.symbol == self.found_state.symbol:
                        s = st
                        break
                assert s is not None
            else:
                s = c.one_state()
            if s.successor is not up_branch and not (
                isinstance(s.successor, int) and s.successor == up_branch
            ):
                c2 = s.successor
                if isinstance(c2, _Ctx):
                    if not ps:
                        return c2
                    c = c2
                    break
                # a *different* text offset: continue building from there?
                # (the reference compares raw refs; unequal text refs can't
                # happen on this path because all suffix successors were
                # set to the same text position)
                raise PpmdError("inconsistent successor chain")
            ps.append(s)
        else:
            pass
        if not isinstance(up_branch, int):
            raise PpmdError("up branch is not a text ref")
        up_symbol = self.text[up_branch]
        up_successor = up_branch + 1
        if c.num_stats == 1:
            up_freq = c.one_state().freq
        else:
            s = None
            for st in c.stats:
                if st.symbol == up_symbol:
                    s = st
                    break
            assert s is not None
            cf = s.freq - 1
            s0 = c.summ_freq - c.num_stats - cf
            if 2 * cf <= s0:
                up_freq = 1 + (1 if 5 * cf > s0 else 0)
            else:
                up_freq = 1 + (2 * cf + 3 * s0 - 1) // (2 * s0)
        for s in reversed(ps):
            if not self._alloc(1):
                return None
            c1 = _Ctx()
            c1.stats = [_State(up_symbol, up_freq, up_successor)]
            c1.summ_freq = 0
            c1.suffix = c
            s.successor = c1
            c = c1
        return c

    def _next_context(self) -> None:
        succ = self.found_state.successor
        if self.order_fall == 0 and isinstance(succ, _Ctx):
            self.min_context = self.max_context = succ
        else:
            self._update_model()

    def _update_model(self) -> None:
        fs = self.found_state
        f_successor = fs.successor
        if fs.freq < MAX_FREQ // 4 and self.min_context.suffix is not None:
            c = self.min_context.suffix
            if c.num_stats == 1:
                s = c.one_state()
                if s.freq < 32:
                    s.freq += 1
            else:
                stats = c.stats
                idx = 0
                if stats[0].symbol != fs.symbol:
                    idx = 1
                    while stats[idx].symbol != fs.symbol:
                        idx += 1
                    if stats[idx].freq >= stats[idx - 1].freq:
                        idx = self._swap_to_front_neighbor(stats, idx)
                if stats[idx].freq < MAX_FREQ - 9:
                    stats[idx].freq += 2
                    c.summ_freq += 2

        if self.order_fall == 0:
            ctx = self._create_successors(True)
            if ctx is None:
                self.restart()
                return
            self.min_context = self.max_context = ctx
            fs.successor = ctx
            return

        self.text.append(fs.symbol)
        successor: Union[int, _Ctx] = len(self.text)
        if len(self.text) >= self.text_limit:
            self.restart()
            return

        if f_successor is not None:
            if isinstance(f_successor, int):  # text ref: realise the chain
                cs = self._create_successors(False)
                if cs is None:
                    self.restart()
                    return
                f_successor = cs
            self.order_fall -= 1
            if self.order_fall == 0:
                successor = f_successor
                if self.max_context is not self.min_context:
                    self.text.pop()
        else:
            fs.successor = successor
            f_successor = self.min_context

        mc = self.min_context
        ns = mc.num_stats
        s0 = mc.summ_freq - ns - (fs.freq - 1)
        c = self.max_context
        while c is not mc:
            ns1 = c.num_stats
            if ns1 != 1:
                if (ns1 & 1) == 0:
                    # capacity grows by one unit when crossing a unit edge
                    old_nu = ns1 >> 1
                    if _units(2 * old_nu) != _units(2 * old_nu + 2):
                        if not self._alloc(1):
                            self.restart()
                            return
                c.summ_freq = c.summ_freq + (1 if 2 * ns1 < ns else 0) + 2 * (
                    1 if (4 * ns1 <= ns and c.summ_freq <= 8 * ns1) else 0
                )
            else:
                if not self._alloc(1):
                    self.restart()
                    return
                s = c.one_state()
                if s.freq < MAX_FREQ // 4 - 1:
                    s.freq <<= 1
                else:
                    s.freq = MAX_FREQ - 4
                c.summ_freq = s.freq + self.init_esc + (1 if ns > 3 else 0)
            cf = 2 * fs.freq * (c.summ_freq + 6)
            sf = s0 + c.summ_freq
            if cf < 6 * sf:
                cf = 1 + (1 if cf > sf else 0) + (1 if cf >= 4 * sf else 0)
                c.summ_freq += 3
            else:
                cf = 4 + (1 if cf >= 9 * sf else 0) + (1 if cf >= 12 * sf else 0) + (
                    1 if cf >= 15 * sf else 0
                )
                c.summ_freq += cf
            c.stats.append(_State(fs.symbol, cf, successor))
            c = c.suffix
        assert isinstance(f_successor, _Ctx)
        self.max_context = self.min_context = f_successor

    # ------------------------------------------------------ symbol decode

    def _update1(self, stats: List[_State], idx: int) -> None:
        s = stats[idx]
        s.freq += 4
        self.min_context.summ_freq += 4
        if s.freq > stats[idx - 1].freq:
            self._swap_to_front_neighbor(stats, idx)
            if s.freq > MAX_FREQ:
                self._rescale()
        self._next_context()

    def _update1_0(self) -> None:
        self.prev_success = 1 if 2 * self.found_state.freq > self.min_context.summ_freq else 0
        self.run_length += self.prev_success
        self.min_context.summ_freq += 4
        self.found_state.freq += 4
        if self.found_state.freq > MAX_FREQ:
            self._rescale()
        self._next_context()

    def _update_bin(self) -> None:
        s = self.found_state
        if s.freq < 128:
            s.freq += 1
        self.prev_success = 1
        self.run_length += 1
        self._next_context()

    def _update2(self) -> None:
        self.found_state.freq += 4
        self.min_context.summ_freq += 4
        if self.found_state.freq > MAX_FREQ:
            self._rescale()
        self.run_length = self.init_rl
        self._update_model()

    def _bin_summ_ref(self):
        mc = self.min_context
        one = mc.one_state()
        assert mc.suffix is not None
        self.hi_bits_flag = self.hb2_flag[self.found_state.symbol]
        row = one.freq - 1
        col = (
            self.prev_success
            + self.ns2bs_indx[mc.suffix.num_stats - 1]
            + self.hi_bits_flag
            + 2 * self.hb2_flag[one.symbol]
            + ((self.run_length >> 26) & 0x20)
        )
        return row, col

    def _make_esc_freq(self, num_masked: int):
        mc = self.min_context
        num_stats = mc.num_stats
        non_masked = num_stats - num_masked
        if num_stats != 256:
            assert mc.suffix is not None
            see = self.see[self.ns2_indx[non_masked - 1]][
                (1 if non_masked < mc.suffix.num_stats - num_stats else 0)
                + 2 * (1 if mc.summ_freq < 11 * num_stats else 0)
                + 4 * (1 if num_masked > non_masked else 0)
                + self.hi_bits_flag
            ]
            esc_freq = see.mean()
        else:
            see = self.dummy_see
            esc_freq = 1
        return see, esc_freq

    def decode_symbol(self, rc) -> int:
        char_mask = bytearray(256)
        mc = self.min_context
        if mc.num_stats != 1:
            stats = mc.stats
            count = rc.get_threshold(mc.summ_freq)
            if count >= mc.summ_freq:
                return -2
            s = stats[0]
            hi_cnt = s.freq
            if count < hi_cnt:
                rc.decode(0, s.freq)
                self.found_state = s
                sym = s.symbol
                self._update1_0()
                return sym
            self.prev_success = 0
            found = -1
            for i in range(1, len(stats)):
                s = stats[i]
                hi_cnt += s.freq
                if hi_cnt > count:
                    found = i
                    break
            if found >= 0:
                s = stats[found]
                rc.decode(hi_cnt - s.freq, s.freq)
                self.found_state = s
                sym = s.symbol
                self._update1(stats, found)
                return sym
            # escape from the current context
            self.hi_bits_flag = self.hb2_flag[self.found_state.symbol]
            rc.decode(hi_cnt, mc.summ_freq - hi_cnt)
            for st in stats:
                char_mask[st.symbol] = 1
        else:
            row, col = self._bin_summ_ref()
            prob = self.bin_summ[row][col]
            bit = rc.decode_bit(prob)
            if bit == 0:
                self.bin_summ[row][col] = min(
                    0xFFFF, prob + (1 << INT_BITS) - _get_mean(prob)
                )
                self.found_state = mc.one_state()
                sym = self.found_state.symbol
                self._update_bin()
                return sym
            self.bin_summ[row][col] = prob - _get_mean(prob)
            self.init_esc = K_EXP_ESCAPE[self.bin_summ[row][col] >> 10]
            char_mask[mc.one_state().symbol] = 1
            self.prev_success = 0
        # masked escape chain
        while True:
            num_masked = self.min_context.num_stats
            while True:
                self.order_fall += 1
                if self.min_context.suffix is None:
                    return -1
                self.min_context = self.min_context.suffix
                if self.min_context.num_stats != num_masked:
                    break
            mc = self.min_context
            hi_cnt = 0
            ps: List[int] = []
            num = mc.num_stats - num_masked
            stats = mc.stats
            i = 0
            while len(ps) != num:
                s = stats[i]
                if not char_mask[s.symbol]:
                    hi_cnt += s.freq
                    ps.append(i)
                i += 1
            see, esc_freq = self._make_esc_freq(num_masked)
            freq_sum = esc_freq + hi_cnt
            count = rc.get_threshold(freq_sum)
            if count < hi_cnt:
                acc = 0
                k = 0
                while True:
                    acc += stats[ps[k]].freq
                    if acc > count:
                        break
                    k += 1
                s = stats[ps[k]]
                rc.decode(acc - s.freq, s.freq)
                see.update()
                self.found_state = s
                sym = s.symbol
                self._update2()
                return sym
            if count >= freq_sum:
                return -2
            rc.decode(hi_cnt, freq_sum - hi_cnt)
            see.summ = (see.summ + freq_sum) & 0xFFFF
            for k in ps:
                char_mask[stats[k].symbol] = 1


# ---------------------------------------------------------- range coders


class Ppmd7zRangeDec:
    """The 7z PPMd range decoder: one zero byte then 4 code bytes."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        if self._byte() != 0:
            raise PpmdError("7z PPMd stream must start with a zero byte")
        self.code = 0
        self.range = MASK32
        for _ in range(4):
            self.code = ((self.code << 8) | self._byte()) & MASK32

    def _byte(self) -> int:
        if self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            return b
        return 0  # zero-pad past the end (reference reads 0 at EOF)

    def get_threshold(self, total: int) -> int:
        self.range //= total
        return self.code // self.range

    def _normalize(self) -> None:
        if self.range < K_TOP:
            self.code = ((self.code << 8) | self._byte()) & MASK32
            self.range = (self.range << 8) & MASK32
            if self.range < K_TOP:
                self.code = ((self.code << 8) | self._byte()) & MASK32
                self.range = (self.range << 8) & MASK32

    def decode(self, start: int, size: int) -> None:
        self.code = (self.code - start * self.range) & MASK32
        self.range = (self.range * size) & MASK32
        self._normalize()

    def decode_bit(self, size0: int) -> int:
        new_bound = ((self.range >> 14) * size0) & MASK32
        if self.code < new_bound:
            self.range = new_bound
            bit = 0
        else:
            self.code = (self.code - new_bound) & MASK32
            self.range = (self.range - new_bound) & MASK32
            bit = 1
        while self.range < K_TOP:
            self.code = ((self.code << 8) | self._byte()) & MASK32
            self.range = (self.range << 8) & MASK32
        return bit


class PpmdRarRangeDec:
    """The RAR3 carryless range coder (low/code/range with BOT/TOP
    renormalisation and 32-bit wraparound), as used for PPM blocks."""

    def __init__(self, reader) -> None:
        # reader: callable returning the next byte (int)
        self._byte = reader
        self.low = 0
        self.code = 0
        self.range = MASK32
        for _ in range(4):
            self.code = ((self.code << 8) | self._byte()) & MASK32

    def get_threshold(self, total: int) -> int:
        self.range //= total
        return ((self.code - self.low) & MASK32) // self.range

    def decode(self, start: int, size: int) -> None:
        self.low = (self.low + start * self.range) & MASK32
        self.range = (self.range * size) & MASK32
        self._normalize()

    def _normalize(self) -> None:
        while True:
            if ((self.low ^ (self.low + self.range)) & MASK32) >= K_TOP:
                if self.range >= K_BOT:
                    break
                self.range = (-self.low) & (K_BOT - 1)
            self.code = ((self.code << 8) | self._byte()) & MASK32
            self.range = (self.range << 8) & MASK32
            self.low = (self.low << 8) & MASK32

    def decode_bit(self, size0: int) -> int:
        self.range >>= 14
        value = ((self.code - self.low) & MASK32) // self.range
        if value < size0:
            self.decode(0, size0)
            return 0
        self.decode(size0, BIN_SCALE - size0)
        return 1


class PpmdRarRangeEnc:
    """The matching carryless range ENCODER — exists so the RAR3 PPM path
    can be validated against libarchive in the encode direction (tests
    write a synthetic RAR3 PPM archive and bsdtar must extract it)."""

    def __init__(self) -> None:
        self.low = 0
        self.range = MASK32
        self.out = bytearray()

    def _normalize(self) -> None:
        while True:
            if ((self.low ^ (self.low + self.range)) & MASK32) >= K_TOP:
                if self.range >= K_BOT:
                    break
                self.range = (-self.low) & (K_BOT - 1)
            self.out.append((self.low >> 24) & 0xFF)
            self.range = (self.range << 8) & MASK32
            self.low = (self.low << 8) & MASK32

    def encode(self, start: int, size: int, total: int) -> None:
        self.range //= total
        self.low = (self.low + start * self.range) & MASK32
        self.range = (self.range * size) & MASK32
        self._normalize()

    def encode_bit(self, bit: int, size0: int) -> None:
        self.range >>= 14
        if bit == 0:
            self.range = (self.range * size0) & MASK32
        else:
            self.low = (self.low + size0 * self.range) & MASK32
            self.range = (self.range * (BIN_SCALE - size0)) & MASK32
        self._normalize()

    def flush(self) -> bytes:
        for _ in range(4):
            self.out.append((self.low >> 24) & 0xFF)
            self.low = (self.low << 8) & MASK32
        return bytes(self.out)


def _encode_symbol(model: Ppmd7, enc: PpmdRarRangeEnc, symbol: int) -> None:
    """Mirror of Ppmd7.decode_symbol choosing intervals by symbol lookup;
    all model updates are the shared methods, so encoder and decoder walk
    identical statistics."""
    char_mask = bytearray(256)
    mc = model.min_context
    if mc.num_stats != 1:
        stats = mc.stats
        s = stats[0]
        if s.symbol == symbol:
            enc.encode(0, s.freq, mc.summ_freq)
            model.found_state = s
            model._update1_0()
            return
        model.prev_success = 0
        hi_cnt = s.freq
        found = -1
        for i in range(1, len(stats)):
            s = stats[i]
            if s.symbol == symbol:
                found = i
                break
            hi_cnt += s.freq
        if found >= 0:
            enc.encode(hi_cnt, s.freq, mc.summ_freq)
            model.found_state = s
            model._update1(stats, found)
            return
        # hi_cnt now equals the sum of every state's freq (escape interval)
        model.hi_bits_flag = model.hb2_flag[model.found_state.symbol]
        enc.encode(hi_cnt, mc.summ_freq - hi_cnt, mc.summ_freq)
        for st in stats:
            char_mask[st.symbol] = 1
    else:
        row, col = model._bin_summ_ref()
        prob = model.bin_summ[row][col]
        one = mc.one_state()
        if one.symbol == symbol:
            enc.encode_bit(0, prob)
            model.bin_summ[row][col] = min(0xFFFF, prob + (1 << INT_BITS) - _get_mean(prob))
            model.found_state = one
            model._update_bin()
            return
        enc.encode_bit(1, prob)
        model.bin_summ[row][col] = prob - _get_mean(prob)
        model.init_esc = K_EXP_ESCAPE[model.bin_summ[row][col] >> 10]
        char_mask[one.symbol] = 1
        model.prev_success = 0
    while True:
        num_masked = model.min_context.num_stats
        while True:
            model.order_fall += 1
            if model.min_context.suffix is None:
                raise PpmdError("symbol not codable")
            model.min_context = model.min_context.suffix
            if model.min_context.num_stats != num_masked:
                break
        mc = model.min_context
        stats = mc.stats
        hi_cnt = 0
        ps: List[int] = []
        num = mc.num_stats - num_masked
        i = 0
        while len(ps) != num:
            st = stats[i]
            if not char_mask[st.symbol]:
                hi_cnt += st.freq
                ps.append(i)
            i += 1
        see, esc_freq = model._make_esc_freq(num_masked)
        freq_sum = esc_freq + hi_cnt
        acc = 0
        found_k = -1
        for k in ps:
            if stats[k].symbol == symbol:
                found_k = k
                break
            acc += stats[k].freq
        if found_k >= 0:
            s = stats[found_k]
            enc.encode(acc, s.freq, freq_sum)
            see.update()
            model.found_state = s
            model._update2()
            return
        enc.encode(hi_cnt, freq_sum - hi_cnt, freq_sum)
        see.summ = (see.summ + freq_sum) & 0xFFFF
        for k in ps:
            char_mask[stats[k].symbol] = 1


def ppmd_rar_compress(data: bytes, order: int = 6, mem_mb: int = 16) -> bytes:
    """Produce a RAR3 PPM-block payload for ``data`` (init byte + mem byte
    + carryless-coded symbols + the esc,2 end-of-file marker)."""
    esc_char = 2
    model = Ppmd7(order, (mem_mb + 1) << 20)
    enc = PpmdRarRangeEnc()
    for b in data:
        _encode_symbol(model, enc, b)
        if b == esc_char:
            _encode_symbol(model, enc, 1)  # literal escape
    _encode_symbol(model, enc, esc_char)
    _encode_symbol(model, enc, 2)  # end of file in PPM mode
    stream = enc.flush()
    head = bytes([0x80 | 0x20 | ((order - 1) & 0x1F), mem_mb])
    return head + stream


# ------------------------------------------------------------ public API


def ppmd7_decompress(packed: bytes, unp_size: int, order: int, mem_size: int) -> bytes:
    """Decode a 7z PPMd (coder id 030401) folder payload."""
    model = Ppmd7(order, mem_size)
    rc = Ppmd7zRangeDec(packed)
    out = bytearray()
    while len(out) < unp_size:
        sym = model.decode_symbol(rc)
        if sym < 0:
            raise PpmdError(f"PPMd stream error at {len(out)}/{unp_size}")
        out.append(sym)
    return bytes(out)
