#!/usr/bin/env python3
"""Head-to-head parity harness against the *compiled reference*.

Builds the reference's own C extensions (`/root/reference/setup.py:51-55` —
they need no third-party packages) out-of-tree in a temp dir, imports them,
and fuzzes this repo's implementations against them:

  1. distance predicates  — >=20,000 random pairs, Hamming + Levenshtein,
     d=0..3, mixed lengths          (vs reference `_distance.within_distance`)
  2. phred reduction      — 5,000 random phred strings, bit-exact float
     equality                       (vs reference `_fastq.average_error_rate`)
  3. trie cluster partitions — random key sets driven through the reference's
     real `Trie.pop_cluster` loop (`_triemodule.c:778-897`) for d=1/d=2
     Hamming and d=1 edit; partition-as-multiset equality vs this repo's
     `fastqdedup_tpu.trie.Trie`
  4. dissection           — >=10,000 random clusters through all three
     methods (`__init__.py:60-122`), ordered-output equality

The reference package `__init__` imports dnaio/xopen; stub modules are
injected so only its pure-Python dissection functions load.  Nothing under
/root/reference is modified; sources are copied to a temp dir and compiled
there.

Usage:  python tools/ref_parity.py [--quick]
Exit 0 = full parity; nonzero = mismatch (details printed).
"""
import argparse
import importlib.util
import random
import shutil
import subprocess
import sys
import sysconfig
import tempfile
import types
from pathlib import Path

REF = Path("/root/reference/src/fastqdedup")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_reference(tmp: Path):
    """Compile the reference's three extension modules into tmp/fastqdedup/."""
    pkg = tmp / "fastqdedup"
    pkg.mkdir()
    for name in ("_triemodule.c", "_distancemodule.c", "_fastqmodule.c",
                 "distances.h", "score_to_error_rate.h", "__init__.py"):
        shutil.copy(REF / name, pkg / name)
    include = sysconfig.get_paths()["include"]
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    for src, mod in (("_triemodule.c", "_trie"),
                     ("_distancemodule.c", "_distance"),
                     ("_fastqmodule.c", "_fastq")):
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", f"-I{include}",
             str(pkg / src), "-o", str(pkg / (mod + ext))],
            check=True, cwd=tmp)

    # Stub the reference's third-party imports (dnaio, xopen) so its
    # __init__.py (and thus its dissection functions) import cleanly.
    dnaio = types.ModuleType("dnaio")
    dnaio.open = lambda *a, **k: None
    dnaio.records_are_mates = lambda *a: True

    class _FFE(Exception):
        pass

    class _SeqRec:
        pass

    dnaio.FastqFormatError = _FFE
    dnaio.SequenceRecord = _SeqRec
    dnaio.exceptions = types.ModuleType("dnaio.exceptions")
    dnaio.exceptions.FastqFormatError = _FFE
    xopen = types.ModuleType("xopen")
    xopen.xopen = lambda *a, **k: None
    sys.modules.setdefault("dnaio", dnaio)
    sys.modules.setdefault("dnaio.exceptions", dnaio.exceptions)
    sys.modules.setdefault("xopen", xopen)

    sys.path.insert(0, str(tmp))
    spec = importlib.util.spec_from_file_location(
        "fastqdedup", pkg / "__init__.py",
        submodule_search_locations=[str(pkg)])
    ref = importlib.util.module_from_spec(spec)
    sys.modules["fastqdedup"] = ref
    spec.loader.exec_module(ref)
    return ref


def random_string(rng, alphabet, lo=0, hi=30):
    n = rng.randint(lo, hi)
    return "".join(rng.choice(alphabet) for _ in range(n))


def fuzz_distance(ref, n_pairs, rng):
    from fastqdedup_tpu.distance import within_distance as mine
    ref_fn = ref.within_distance
    alphabets = ["ACGT", "ACGTN", "AC", "ABCDEFGH"]
    bad = 0
    for i in range(n_pairs):
        alpha = rng.choice(alphabets)
        s1 = random_string(rng, alpha)
        if rng.random() < 0.5:
            # correlated pair: mutate s1
            s2 = list(s1)
            for _ in range(rng.randint(0, 4)):
                op = rng.random()
                if not s2 or op < 0.5:
                    s2.insert(rng.randint(0, len(s2)), rng.choice(alpha))
                elif op < 0.75:
                    del s2[rng.randrange(len(s2))]
                else:
                    s2[rng.randrange(len(s2))] = rng.choice(alpha)
            s2 = "".join(s2)
        else:
            s2 = random_string(rng, alpha)
        d = rng.randint(0, 3)
        edit = rng.random() < 0.5
        got = mine(s1, s2, d, edit)
        want = ref_fn(s1, s2, d, edit)
        if got != want:
            bad += 1
            print(f"DIST MISMATCH: {s1!r} {s2!r} d={d} edit={edit} "
                  f"ours={got} ref={want}")
            if bad > 5:
                break
    print(f"[1] distance: {n_pairs} pairs, {bad} mismatches")
    return bad == 0


def fuzz_phred(ref, n, rng):
    from fastqdedup_tpu.quality import average_error_rate as mine
    ref_fn = ref.fastq_average_error_rate
    bad = 0
    for i in range(n):
        length = rng.randint(1, 300)
        offset = rng.choice([33, 33, 33, 0, 64])
        phred = "".join(chr(rng.randint(offset, 126)) for _ in range(length))
        got = mine(phred, phred_offset=offset)
        want = ref_fn(phred, phred_offset=offset)
        if got != want:  # bit-exact float equality
            bad += 1
            print(f"PHRED MISMATCH: {phred!r} offset={offset} "
                  f"ours={got!r} ref={want!r}")
            if bad > 5:
                break
    print(f"[2] phred: {n} strings, {bad} mismatches (bit-exact)")
    return bad == 0


def partitions_from_trie(trie_cls, keys, d, edit):
    """Drive a Trie's pop_cluster loop to a canonical partition multiset."""
    t = trie_cls("ACGTN")
    for k in keys:
        t.add_sequence(k)
    parts = []
    while t.number_of_sequences:
        parts.append(frozenset(t.pop_cluster(d, edit)))
    return sorted(parts, key=lambda fs: sorted(fs))


def fuzz_trie(ref, n_rounds, keys_per_round, rng):
    from fastqdedup_tpu.trie import Trie as MyTrie
    RefTrie = ref.Trie
    bad = 0
    configs = [(1, False), (2, False), (1, True)]
    for r in range(n_rounds):
        length = rng.choice([8, 12, 16])
        base_n = rng.randint(4, max(6, keys_per_round // (2 ** r if r < 3 else 8)))
        bases = {random_string(rng, "ACGT", length, length)
                 for _ in range(base_n)}
        keys = []
        for b in bases:
            keys.append(b)
            for _ in range(rng.randint(0, 6)):
                m = list(b)
                for _ in range(rng.randint(1, 2)):
                    m[rng.randrange(len(m))] = rng.choice("ACGTN")
                keys.append("".join(m))
        rng.shuffle(keys)
        keys = keys[:keys_per_round]
        for d, edit in configs:
            mine = partitions_from_trie(MyTrie, keys, d, edit)
            want = partitions_from_trie(RefTrie, keys, d, edit)
            if mine != want:
                bad += 1
                print(f"TRIE MISMATCH: round={r} d={d} edit={edit} "
                      f"nkeys={len(keys)}")
                print(f"  ours={mine[:4]}...\n  ref ={want[:4]}...")
    total = n_rounds * len(configs)
    print(f"[3] trie partitions: {total} runs "
          f"({n_rounds} key sets x d=1/d=2/edit), {bad} mismatches")
    return bad == 0


def fuzz_dissect(ref, n_cases, rng):
    import fastqdedup_tpu.dissect as mine
    pairs = [
        ("directional", ref.cluster_dissection_directional,
         mine.cluster_dissection_directional),
        ("adjacency", ref.cluster_dissection_adjacency,
         mine.cluster_dissection_adjacency),
        ("highest_count", ref.cluster_dissection_highest_count,
         mine.cluster_dissection_highest_count),
    ]
    bad = 0
    for i in range(n_cases):
        length = rng.choice([6, 8, 10])
        base = random_string(rng, "ACGT", length, length)
        cluster = []
        for _ in range(rng.randint(1, 14)):
            m = list(base)
            for _ in range(rng.randint(0, 3)):
                m[rng.randrange(len(m))] = rng.choice("ACGTN")
            cluster.append((rng.randint(1, 8), "".join(m)))
        d = rng.randint(1, 2)
        edit = rng.random() < 0.3
        for name, ref_fn, my_fn in pairs:
            want = list(ref_fn(list(cluster), d, edit))
            got = list(my_fn(list(cluster), d, edit))
            if got != want:
                bad += 1
                print(f"DISSECT MISMATCH [{name}]: cluster={cluster} "
                      f"d={d} edit={edit}\n  ours={got}\n  ref ={want}")
                if bad > 5:
                    return False
    print(f"[4] dissection: {n_cases} clusters x 3 methods "
          f"= {n_cases * 3} cases, {bad} mismatches")
    return bad == 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="smaller fuzz budgets (CI-friendly)")
    ap.add_argument("--seed", type=int, default=20260820)
    args = ap.parse_args()
    rng = random.Random(args.seed)

    n_dist = 2000 if args.quick else 20000
    n_phred = 500 if args.quick else 5000
    n_trie = 8 if args.quick else 40
    n_dissect = 1000 if args.quick else 6000

    tmp = Path(tempfile.mkdtemp(prefix="fastqdedup_ref_"))
    try:
        print(f"building reference extensions in {tmp} ...")
        ref = build_reference(tmp)
        ok = True
        ok &= fuzz_distance(ref, n_dist, rng)
        ok &= fuzz_phred(ref, n_phred, rng)
        ok &= fuzz_trie(ref, n_trie, 3000 if not args.quick else 400, rng)
        ok &= fuzz_dissect(ref, n_dissect, rng)
        print("PARITY: " + ("OK — full head-to-head parity vs compiled "
                            "reference" if ok else "FAILED"))
        return 0 if ok else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
