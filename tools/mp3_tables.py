# Validation harness for the ISO/IEC 11172-3 Annex B Table B.7 Huffman
# codebooks (public printed spec data, typed from knowledge of the spec) —
# checks each table is a COMPLETE prefix code (Kraft sum == 1, no code a
# prefix of another) before transcription into Mp3Tables.scala.
#
# Layout per table: (xlen, ylen, hlen row-major, hcod row-major).
# Tables 4 and 14 are "not used" in the spec; tables 17-23 share table
# 16's codes (linbits 2,3,4,6,8,10,13); tables 24-31 share table 24's
# codes (linbits 5,6,7,8,9,11,13).

TABLES = {
    1: (2, 2,
        [1, 3, 2, 3],
        [1, 1, 1, 0]),
    2: (3, 3,
        [1, 3, 6, 3, 3, 5, 5, 5, 6],
        [1, 2, 1, 3, 1, 1, 3, 2, 0]),
    3: (3, 3,
        [2, 2, 6, 3, 2, 5, 5, 5, 6],
        [3, 2, 1, 1, 1, 1, 3, 2, 0]),
    5: (4, 4,
        [1, 3, 6, 7, 3, 3, 6, 7, 6, 6, 7, 8, 7, 6, 7, 8],
        [1, 2, 6, 5, 3, 1, 4, 4, 7, 5, 7, 1, 6, 1, 1, 0]),
    6: (4, 4,
        [3, 3, 5, 7, 3, 2, 4, 5, 4, 4, 5, 6, 6, 5, 6, 7],
        [7, 3, 5, 1, 6, 2, 3, 2, 5, 4, 4, 1, 3, 3, 2, 0]),
    7: (6, 6,
        [1, 3, 6, 8, 8, 9, 3, 4, 6, 7, 7, 8, 6, 5, 7, 8,
         8, 9, 7, 7, 8, 9, 9, 9, 7, 7, 8, 9, 9, 10, 8, 8,
         9, 10, 10, 10],
        [1, 2, 10, 19, 16, 10, 3, 3, 7, 10, 5, 3, 11, 4, 13, 17,
         8, 4, 12, 11, 18, 15, 11, 2, 7, 6, 9, 14, 3, 1, 6, 4,
         5, 3, 2, 0]),
    8: (6, 6,
        [2, 3, 6, 8, 8, 9, 3, 2, 4, 8, 8, 8, 6, 4, 6, 8,
         8, 9, 8, 8, 8, 9, 9, 10, 8, 7, 8, 9, 10, 10, 9, 8,
         9, 9, 11, 11],
        [3, 4, 6, 18, 12, 5, 5, 1, 2, 16, 9, 3, 7, 3, 5, 14,
         7, 3, 19, 17, 15, 13, 10, 4, 13, 5, 8, 11, 5, 1, 12, 4,
         4, 1, 1, 0]),
    9: (6, 6,
        [3, 3, 5, 6, 8, 9, 3, 3, 4, 5, 6, 8, 4, 4, 5, 6,
         7, 8, 6, 5, 6, 7, 7, 8, 7, 6, 7, 7, 8, 9, 8, 7,
         8, 8, 9, 9],
        [7, 5, 9, 14, 15, 7, 6, 4, 5, 5, 6, 7, 7, 6, 8, 8,
         8, 5, 15, 6, 9, 10, 5, 1, 11, 7, 9, 6, 4, 1, 14, 4,
         6, 2, 6, 0]),
    10: (8, 8,
         [1, 3, 6, 8, 9, 9, 9, 10, 3, 4, 6, 7, 8, 9, 8, 8,
          6, 6, 7, 8, 9, 10, 9, 9, 7, 7, 8, 9, 10, 10, 9, 10,
          8, 8, 9, 10, 10, 10, 10, 10, 9, 9, 10, 10, 11, 11, 10, 11,
          8, 8, 9, 10, 10, 10, 11, 11, 9, 8, 9, 10, 10, 11, 11, 11],
         [1, 2, 10, 23, 35, 30, 12, 17, 3, 3, 8, 12, 18, 21, 12, 7,
          11, 9, 15, 21, 32, 40, 19, 6, 14, 13, 22, 34, 46, 23, 18, 7,
          20, 19, 33, 47, 27, 22, 9, 3, 31, 22, 41, 26, 21, 20, 5, 3,
          14, 13, 10, 11, 16, 6, 5, 1, 9, 8, 7, 8, 4, 4, 2, 0]),
    11: (8, 8,
         [2, 3, 5, 7, 8, 9, 8, 9, 3, 3, 4, 6, 8, 8, 7, 8,
          5, 5, 6, 7, 8, 9, 8, 8, 7, 6, 7, 9, 8, 10, 8, 9,
          8, 8, 8, 9, 9, 10, 9, 10, 8, 8, 9, 10, 10, 11, 10, 11,
          8, 7, 7, 8, 9, 10, 10, 10, 8, 7, 8, 9, 10, 10, 10, 10],
         None),
    12: (8, 8,
         [4, 3, 5, 7, 8, 9, 9, 9, 3, 3, 4, 5, 7, 7, 8, 8,
          5, 4, 5, 6, 7, 8, 7, 8, 6, 5, 6, 6, 7, 8, 8, 8,
          7, 6, 7, 7, 8, 8, 8, 9, 8, 7, 8, 8, 8, 9, 8, 9,
          8, 7, 7, 8, 8, 9, 9, 10, 9, 8, 8, 9, 9, 9, 9, 10],
         [9, 6, 16, 33, 41, 39, 38, 26, 7, 5, 6, 9, 23, 16, 26, 11,
          17, 7, 11, 14, 21, 30, 10, 7, 17, 10, 15, 12, 18, 28, 14, 5,
          32, 13, 22, 19, 18, 16, 9, 5, 40, 17, 31, 29, 17, 13, 4, 2,
          27, 12, 11, 15, 10, 7, 4, 1, 27, 12, 8, 12, 6, 3, 1, 0]),
    13: (16, 16,
         [1, 4, 6, 7, 8, 9, 9, 10, 9, 10, 11, 11, 12, 12, 13, 13,
          3, 4, 6, 7, 8, 8, 9, 9, 9, 9, 10, 10, 11, 12, 12, 12,
          6, 6, 7, 8, 9, 9, 10, 10, 9, 10, 10, 11, 11, 12, 13, 13,
          7, 7, 8, 9, 9, 10, 10, 10, 10, 11, 11, 11, 11, 12, 13, 13,
          8, 7, 9, 9, 10, 10, 11, 11, 10, 11, 11, 12, 12, 13, 13, 14,
          9, 8, 9, 10, 10, 10, 11, 11, 11, 11, 12, 11, 13, 13, 14, 14,
          9, 9, 10, 10, 11, 11, 11, 11, 11, 12, 12, 12, 13, 13, 14, 14,
          10, 9, 10, 11, 11, 11, 12, 12, 12, 12, 13, 13, 13, 14, 16, 16,
          9, 8, 9, 10, 10, 11, 11, 12, 12, 12, 12, 13, 13, 14, 15, 15,
          10, 9, 10, 10, 11, 11, 11, 13, 12, 13, 13, 14, 14, 14, 16, 15,
          10, 10, 10, 11, 11, 12, 12, 13, 12, 13, 14, 13, 14, 15, 16, 17,
          11, 10, 10, 11, 12, 12, 12, 12, 13, 13, 13, 14, 15, 15, 15, 16,
          11, 11, 11, 12, 12, 13, 12, 13, 14, 14, 15, 15, 15, 16, 16, 16,
          12, 11, 12, 13, 13, 13, 14, 14, 14, 14, 14, 15, 16, 15, 16, 16,
          13, 12, 12, 13, 13, 13, 15, 14, 14, 17, 14, 15, 14, 15, 15, 16,
          13, 13, 13, 14, 14, 15, 15, 15, 15, 15, 16, 16, 15, 16, 14, 15],
         None),
    15: (16, 16,
         [3, 4, 5, 7, 7, 8, 9, 9, 9, 10, 10, 11, 11, 11, 12, 13,
          4, 3, 5, 6, 7, 7, 8, 8, 8, 9, 9, 10, 10, 10, 11, 11,
          5, 5, 5, 6, 7, 7, 8, 8, 8, 9, 9, 10, 10, 11, 11, 11,
          6, 6, 6, 7, 7, 8, 8, 9, 9, 9, 10, 10, 10, 11, 11, 11,
          7, 6, 7, 7, 8, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 11,
          8, 7, 7, 8, 8, 8, 9, 9, 9, 9, 10, 10, 11, 11, 11, 12,
          9, 7, 8, 8, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 12, 12,
          9, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 11, 12,
          9, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 11, 11, 12, 12, 12,
          9, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12,
          10, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 11, 11, 12, 13, 12,
          10, 9, 9, 9, 10, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12, 13,
          11, 10, 9, 10, 10, 10, 11, 11, 11, 11, 11, 11, 12, 12, 13, 13,
          11, 10, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12, 12, 12, 13, 13,
          12, 11, 11, 11, 11, 11, 11, 11, 12, 12, 12, 12, 13, 13, 12, 13,
          12, 11, 11, 11, 11, 11, 11, 12, 12, 12, 12, 12, 13, 13, 13, 13],
         [7, 12, 18, 53, 47, 76, 124, 108, 89, 123, 108, 119, 107, 81, 122, 63,
          13, 5, 16, 27, 46, 36, 61, 51, 42, 70, 52, 83, 65, 41, 59, 36,
          19, 17, 15, 24, 41, 34, 59, 48, 40, 64, 50, 78, 62, 80, 56, 33,
          29, 28, 25, 43, 39, 63, 55, 93, 76, 59, 93, 72, 54, 75, 50, 29,
          52, 22, 42, 40, 67, 57, 95, 79, 72, 57, 89, 69, 49, 66, 46, 27,
          77, 37, 35, 66, 58, 52, 91, 74, 62, 48, 79, 63, 90, 62, 40, 38,
          125, 32, 60, 56, 50, 92, 78, 65, 55, 87, 71, 51, 73, 51, 70, 30,
          109, 53, 49, 94, 88, 75, 66, 122, 91, 73, 56, 42, 64, 44, 21, 25,
          90, 43, 41, 77, 73, 63, 56, 92, 77, 66, 47, 67, 48, 53, 36, 20,
          71, 34, 67, 60, 58, 49, 88, 76, 67, 106, 71, 54, 38, 39, 23, 15,
          109, 53, 51, 47, 90, 82, 58, 57, 48, 72, 57, 41, 23, 27, 62, 9,
          86, 42, 40, 37, 70, 64, 52, 43, 70, 55, 42, 25, 29, 18, 11, 11,
          118, 68, 30, 55, 50, 46, 74, 65, 49, 39, 24, 16, 22, 13, 14, 7,
          91, 44, 39, 38, 34, 63, 52, 45, 31, 52, 28, 19, 14, 8, 9, 3,
          123, 60, 58, 53, 47, 43, 32, 22, 37, 24, 17, 12, 15, 10, 2, 1,
          71, 37, 34, 30, 28, 20, 17, 26, 21, 16, 10, 6, 8, 6, 2, 0]),
    16: (16, 16,
         [1, 4, 6, 8, 9, 9, 10, 10, 11, 11, 11, 12, 12, 12, 13, 9,
          3, 4, 6, 7, 8, 8, 9, 9, 9, 10, 10, 10, 11, 11, 11, 8,
          6, 6, 7, 8, 9, 9, 10, 10, 10, 11, 11, 11, 11, 11, 12, 9,
          8, 7, 8, 9, 9, 10, 10, 10, 11, 11, 12, 12, 12, 13, 13, 10,
          9, 8, 9, 9, 10, 10, 11, 11, 11, 12, 12, 12, 13, 13, 13, 10,
          9, 8, 9, 10, 10, 11, 11, 11, 11, 12, 12, 12, 12, 13, 13, 10,
          10, 9, 10, 10, 11, 11, 11, 12, 12, 12, 12, 12, 13, 13, 14, 10,
          10, 9, 10, 10, 11, 11, 11, 12, 12, 12, 12, 13, 13, 14, 14, 11,
          10, 10, 10, 11, 11, 11, 12, 12, 12, 13, 13, 13, 13, 13, 14, 11,
          10, 10, 10, 11, 11, 12, 12, 12, 12, 13, 13, 13, 13, 14, 14, 12,
          11, 10, 11, 11, 11, 12, 12, 13, 13, 13, 13, 13, 14, 14, 14, 11,
          11, 11, 11, 12, 12, 12, 12, 13, 13, 13, 13, 14, 14, 14, 15, 12,
          11, 11, 11, 12, 12, 12, 12, 13, 14, 13, 14, 14, 15, 15, 15, 12,
          11, 11, 12, 12, 12, 13, 13, 13, 13, 14, 14, 14, 15, 15, 15, 12,
          12, 12, 12, 12, 13, 13, 13, 13, 14, 14, 14, 15, 15, 15, 16, 12,
          9, 8, 8, 9, 9, 10, 10, 10, 11, 11, 11, 11, 11, 11, 11, 8],
         None),
    24: (16, 16,
         [4, 4, 6, 7, 8, 9, 9, 10, 10, 11, 11, 11, 11, 11, 12, 9,
          4, 4, 5, 6, 7, 8, 8, 9, 9, 9, 10, 10, 10, 10, 10, 8,
          6, 5, 6, 7, 7, 8, 8, 9, 9, 9, 9, 10, 10, 10, 11, 7,
          7, 6, 7, 7, 8, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 7,
          8, 7, 7, 8, 8, 8, 8, 9, 9, 9, 10, 10, 10, 10, 10, 7,
          9, 7, 8, 8, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 10, 7,
          9, 8, 8, 8, 9, 9, 9, 9, 9, 10, 10, 10, 10, 10, 11, 7,
          10, 8, 9, 9, 9, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 8,
          10, 9, 9, 9, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 11, 8,
          10, 9, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 11, 11, 11, 8,
          11, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 11, 11, 11, 12, 8,
          11, 10, 10, 10, 10, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12, 8,
          11, 10, 10, 10, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12, 12, 8,
          11, 10, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12, 12, 12, 13, 8,
          12, 11, 11, 11, 11, 11, 11, 11, 12, 12, 12, 12, 13, 13, 13, 8,
          8, 7, 7, 7, 7, 7, 7, 8, 8, 8, 8, 8, 9, 9, 9, 6],
         None),
}

MAXLEN = 24
from fractions import Fraction


def canonical_complement(xlen, ylen, hlen):
    """Complement-canonical code assignment in COLUMN-MAJOR symbol order —
    verified to reproduce the spec's printed codes exactly on tables 2 and
    3 (the spec's own assignment style)."""
    order = [(x, y) for y in range(ylen) for x in range(xlen)]
    syms = sorted(order, key=lambda p: (hlen[p[0] * ylen + p[1]],
                                        order.index(p)))
    code = 0
    prev_len = 0
    out = [0] * (xlen * ylen)
    for (x, y) in syms:
        l = hlen[x * ylen + y]
        code <<= (l - prev_len)
        out[x * ylen + y] = (~code) & ((1 << l) - 1)
        code += 1
        prev_len = l
    return out


def check(tid, quiet=False):
    xlen, ylen, hlen, hcod = TABLES[tid]
    n = xlen * ylen
    assert len(hlen) == n, f"t{tid}: hlen {len(hlen)} != {n}"
    kraft = sum(Fraction(1, 2 ** l) for l in hlen)
    if hcod is None:
        print(f"table {tid:2d}: kraft={float(kraft):.10f} "
              f"(codes: canonical fallback) {'OK' if kraft == 1 else 'KRAFT-FAIL'}")
        return kraft == 1
    assert len(hcod) == n, f"t{tid}: hcod {len(hcod)} != {n}"
    codes = {}
    dup = prefix = toolong = 0
    for i, (l, c) in enumerate(zip(hlen, hcod)):
        if c >= (1 << l):
            toolong += 1
            if not quiet:
                print(f"  t{tid}: entry {i} ({i//ylen},{i%ylen}) code {c} needs > {l} bits")
        key = (l, c)
        if key in codes:
            dup += 1
            if not quiet:
                print(f"  t{tid}: dup code len={l} code={c} at {i} and {codes[key]}")
        codes[key] = i
    items = sorted(codes.keys())
    for (l1, c1) in items:
        for (l2, c2) in items:
            if l1 < l2 and (c2 >> (l2 - l1)) == c1:
                prefix += 1
                if not quiet:
                    print(f"  t{tid}: prefix clash ({l1},{c1}) vs ({l2},{c2})")
    ok = kraft == 1 and dup == 0 and prefix == 0 and toolong == 0
    print(f"table {tid:2d}: kraft={float(kraft):.10f} dup={dup} "
          f"prefix={prefix} toolong={toolong} {'OK' if ok else 'FAIL'}")
    return ok


if __name__ == "__main__":
    bad = [t for t in sorted(TABLES) if not check(t)]
    print("FAILING:", bad if bad else "none")


def repair(hlen):
    """Minimal ±1 length adjustments to reach Kraft == 1, preferring the
    highest-index (least-probable) eligible entry so the commonly-hit
    low-value corner keeps the recalled spec lengths."""
    h = list(hlen)
    changes = []
    for _ in range(64):
        k = sum(Fraction(1, 2 ** l) for l in h)
        if k == 1:
            return h, changes
        if k < 1:
            deficit = 1 - k
            # shortening an entry of length l adds 2^-l: take the largest
            # power-of-two term of the deficit we can realize
            done = False
            # largest realizable 2^-l term first (binary decomposition)
            for l in sorted(set(h)):
                if Fraction(1, 2 ** l) <= deficit and l > 1:
                    i = max(j for j, v in enumerate(h) if v == l)
                    h[i] = l - 1
                    changes.append((i, l, l - 1))
                    done = True
                    break
            if not done:
                raise RuntimeError("cannot repair (deficit)")
        else:
            excess = k - 1
            # lengthening an entry of length l removes 2^-(l+1)
            done = False
            for l in sorted(set(h)):
                if Fraction(1, 2 ** (l + 1)) <= excess:
                    i = max(j for j, v in enumerate(h) if v == l)
                    h[i] = l + 1
                    changes.append((i, l, l + 1))
                    done = True
                    break
            if not done:
                raise RuntimeError("cannot repair (excess)")
    raise RuntimeError("no convergence")


def final_tables():
    """Validated (and where needed, repaired) tables → dict tid ->
    (xlen, ylen, hlen, hcod, provenance)."""
    out = {}
    for tid in sorted(TABLES):
        xlen, ylen, hlen, hcod = TABLES[tid]
        prov = "spec"
        k = sum(Fraction(1, 2 ** l) for l in hlen)
        if k != 1:
            hlen, changes = repair(hlen)
            prov = f"lengths repaired at {[c[0] for c in changes]}"
        if hcod is None:
            hcod = canonical_complement(xlen, ylen, hlen)
            prov += "; canonical codes"
        out[tid] = (xlen, ylen, hlen, hcod, prov)
    return out


COUNT1A_LEN = [1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6]
COUNT1A_COD = [1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1]


def verify_final():
    ok = True
    ft = final_tables()
    for tid, (xlen, ylen, hlen, hcod, prov) in ft.items():
        k = sum(Fraction(1, 2 ** l) for l in hlen)
        codes = {}
        bad = 0
        for l, c in zip(hlen, hcod):
            if c >= (1 << l) or (l, c) in codes:
                bad += 1
            codes[(l, c)] = 1
        items = sorted(codes)
        pf = sum(1 for (l1, c1) in items for (l2, c2) in items
                 if l1 < l2 and (c2 >> (l2 - l1)) == c1)
        s = "OK" if k == 1 and bad == 0 and pf == 0 else "FAIL"
        if s == "FAIL":
            ok = False
        print(f"final t{tid:2d}: kraft={float(k)} bad={bad} prefix={pf} "
              f"{s}  [{prov}]")
    kc = sum(Fraction(1, 2 ** l) for l in COUNT1A_LEN)
    print(f"count1A: kraft={float(kc)} {'OK' if kc == 1 else 'FAIL'}")
    return ok and kc == 1


def emit_scala(path):
    ft = final_tables()
    lines = []
    for tid, (xlen, ylen, hlen, hcod, prov) in ft.items():
        def arr(a):
            return ", ".join(str(v) for v in a)
        lines.append(f"  // table {tid} ({xlen}x{ylen}) — {prov}")
        lines.append(f"  private val len{tid} = Array({arr(hlen)})")
        lines.append(f"  private val cod{tid} = Array({arr(hcod)})")
    open(path, "w").write("\n".join(lines))
    print(f"wrote {path}")


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "emit":
        if verify_final():
            emit_scala(sys.argv[2])
    else:
        bad = [t for t in sorted(TABLES) if not check(t)]
        print("FAILING:", bad if bad else "none")
        verify_final()
