"""Trie statistics pretty-printer (reference __init__.py:133-157)."""

import io

from .trie import Trie


def trie_stats(trie: Trie) -> str:
    """Layer histogram + memory breakdown, formatted like the reference."""
    outbuffer = io.StringIO()
    raw_stats = trie.raw_stats()
    layer_size = len(trie.alphabet) + 1
    all_totals = [0 for _ in range(layer_size + 1)]
    outbuffer.write("layer     terminal  " +
                    "".join(f"{i:10}" for i in range(1, layer_size)) +
                    "     total\n")
    for i, layer_stats in enumerate(raw_stats):
        total = sum(layer_stats)
        for j in range(layer_size):
            all_totals[j] += layer_stats[j]
        all_totals[layer_size] += total
        line = [str(i)] + list(layer_stats) + [total]
        outbuffer.write("".join(f"{v:10}" for v in line) + "\n")
    last_line = ["total"] + all_totals
    outbuffer.write("".join(f"{v:10}" for v in last_line) + "\n")
    node_memory_usage = sum((8 + 8 * i) * all_totals[i]
                            for i in range(layer_size))
    total_memory_usage = trie.memory_size()
    suffix_memory_usage = total_memory_usage - node_memory_usage
    gb = 1024 ** 3
    outbuffer.write(
        f"Node memory usage: {node_memory_usage / gb:.2} GiB\n"
        f"Suffix memory usage: {suffix_memory_usage / gb:.2} GiB\n"
        f"Total memory usage: {total_memory_usage / gb:.2} GiB\n")
    return outbuffer.getvalue()
