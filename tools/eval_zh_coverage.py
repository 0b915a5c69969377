#!/usr/bin/env python
"""Frequency-weighted hanzi coverage of the standalone ZH G2P table.

The reference gets full hanzi coverage from the ``pypinyin`` dependency
(reference ``text/mandarin.py:243-257``); this repo embeds its own table
(text/hanzi_pinyin_data.py).  This tool measures what fraction of real
Chinese text that table covers, using the bundled jieba dictionary
(~349k words with corpus frequencies, ~12k distinct hanzi) as a
frequency-weighted proxy corpus, and lists the top uncovered characters
to drive the next data tranche.

Note: jieba's dict contains a small amount of mojibake (GBK-as-UTF8
artifacts); the --top list needs a human filter before adding entries.

Usage:
    python tools/eval_zh_coverage.py [--top N]
"""

import argparse
import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def hanzi_frequencies():
    import jieba

    path = os.path.join(os.path.dirname(jieba.__file__), "dict.txt")
    freq = collections.Counter()
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            word, count = parts[0], int(parts[1])
            for ch in word:
                if "一" <= ch <= "鿿":
                    freq[ch] += count
    return freq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=0,
                    help="also list the N most frequent uncovered hanzi")
    args = ap.parse_args()

    from personalized_text_to_speech_tpu.text import mandarin

    freq = hanzi_frequencies()
    table = mandarin._HANZI_PINYIN
    total = sum(freq.values())
    covered = sum(c for ch, c in freq.items() if ch in table)
    covered_types = sum(1 for ch in freq if ch in table)
    missing = [(ch, c) for ch, c in freq.most_common() if ch not in table]

    print(json.dumps({
        "metric": "mandarin hanzi coverage (builtin fallback)",
        "table_size": len(table),
        "corpus_distinct_hanzi": len(freq),
        "corpus_weighted_tokens": total,
        "token_coverage": round(covered / total, 5),
        "type_coverage": round(covered_types / len(freq), 4),
    }))
    for ch, c in missing[: args.top]:
        print(f"{c:>10}  {ch}  U+{ord(ch):04X}")


if __name__ == "__main__":
    main()
