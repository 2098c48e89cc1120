"""Offline search for a multi-candidate incremental-dedup counterexample.

Finds texts T (batch), A, B (corpus) on the md5 hash family such that:
- A and B each share >=1 full LSH band (4 consecutive sig slots) with T
  -> both are candidates;
- each pair's signature agreement is < 32/64 (below threshold 0.5);
- the POOLED agreement (count_A + count_B) >= 32 -> the pre-round-14
  pooled oracle would flag a false near-dup.

The found texts get hard-coded into tests/test_dedup_similarity.py.
Pure-Python replica of operators/dedup.py's md5 family (verified against
Spark in the test itself).
"""
import hashlib
import random


def toks(text):
    return [t for t in text.lower().split() if t]


def shingles(text, n=3):
    t = toks(text)
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


def sig(text, num_hashes=64):
    out = [None] * num_hashes
    for sh in shingles(text):
        d = hashlib.md5((sh + "|mh").encode()).hexdigest()
        a = int(d[:8], 16)
        b = int(d[8:16], 16)
        for i in range(num_hashes):
            h = (a + (i + 1) * b) % (2 ** 32)
            if out[i] is None or h < out[i]:
                out[i] = h
    return out


def agree(s1, s2):
    return sum(1 for x, y in zip(s1, s2) if x == y)


def band_match(s1, s2, bands=16, r=4):
    for b in range(bands):
        if all(s1[b * r + j] == s2[b * r + j] for j in range(r)):
            return True
    return False


WORDS = [f"w{i}" for i in range(200)]


def make(rng, base, keep_frac):
    out = []
    for w in base:
        if rng.random() < keep_frac:
            out.append(w)
        else:
            out.append(rng.choice(WORDS))
    return " ".join(out)


def main():
    rng = random.Random(0)
    for trial in range(200000):
        base = [rng.choice(WORDS) for _ in range(40)]
        t_text = " ".join(base)
        st = sig(t_text)
        a_text = make(rng, base, 0.62)
        sa = sig(a_text)
        ca = agree(st, sa)
        if not (16 <= ca <= 30) or not band_match(st, sa):
            continue
        b_text = make(rng, base, 0.62)
        sb = sig(b_text)
        cb = agree(st, sb)
        if not (16 <= cb <= 30) or not band_match(st, sb):
            continue
        if ca + cb >= 34:  # margin over 32
            print(f"trial={trial} agree_A={ca} agree_B={cb} pooled={ca+cb}")
            print("T =", repr(t_text))
            print("A =", repr(a_text))
            print("B =", repr(b_text))
            return
    print("not found")


if __name__ == "__main__":
    main()
