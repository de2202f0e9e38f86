"""BMES char-file parsing — port of the reference corpus normalizer
`data/cner/raw_data/process.py:5-87` (the S1 scan).  Bit-exact on
well-formed files (every sentence terminated by a blank line, no entity
spanning a sentence break) — which is what the cner corpus is and what the
parity tests pin.  Two intentional deviations on MALFORMED input:

- a half-open entity (B-/M- without E-) is reset at the sentence break
  here; the reference carries ``entity_tmp`` across the break into the
  next sentence;
- a final sentence not followed by a trailing blank line is flushed here;
  the reference silently drops it.

Both reference behaviors are data-loss bugs on inputs the reference never
sees; a corpus scanner at 100 TB should not inherit them.

Reference semantics, preserved quirks included:
- lines are ``char SPACE tag``; a non-2-field line (blank) closes the
  sentence;
- entity surface forms are accumulated over B-/M-/E- (BMES's M == BIO's I)
  and S- tags, and DEDUPED per sentence on (surface, type)
  (`process.py:36-37`);
- offsets are then recovered by ``re.finditer(surface, text)`` with the
  RAW surface as the pattern (`process.py:64`), so one surface occurring
  k times yields k labels, and regex metacharacters in a mention behave
  exactly as they do in the reference;
- labels are sorted by (start, end) and numbered T0.. (`process.py:69-73`),
  with ``end`` exclusive.
"""

from __future__ import annotations

import re

Label = list  # ["Tj", type, start, end, mention] — mid_data shape


def parse_bmes_lines(lines: list[str]) -> list[tuple[str, list[Label]]]:
    """Raw file lines -> [(sentence_text, labels)], reference-exact."""
    texts: list[str] = []
    per_sent: list[list[tuple[str, str]]] = []
    words: list[str] = []
    entity_tmp: list[str] = []
    entities_tmp: list[tuple[str, str]] = []
    for raw in lines:
        parts = raw.strip().split(" ")
        if len(parts) == 2:
            word, label = parts
            words.append(word)
            if "B-" in label or "M-" in label:
                entity_tmp.append(word)
            elif "E-" in label:
                entity_tmp.append(word)
                key = ("".join(entity_tmp), label.split("-")[-1])
                if key not in entities_tmp:
                    entities_tmp.append(key)
                entity_tmp = []
            if "S-" in label:
                entity_tmp.append(word)
                key = ("".join(entity_tmp), label.split("-")[-1])
                if key not in entities_tmp:
                    entities_tmp.append(key)
                entity_tmp = []
        else:
            texts.append("".join(words))
            per_sent.append(entities_tmp)
            words = []
            entities_tmp = []
            entity_tmp = []
    if words:  # file not terminated by a blank line
        texts.append("".join(words))
        per_sent.append(entities_tmp)

    out: list[tuple[str, list[Label]]] = []
    for text, entities in zip(texts, per_sent):
        labels: list[Label] = []
        if entities:
            found = []
            for surface, etype in entities:
                for m in re.finditer(surface, text):
                    found.append((etype, m.start(), m.end(), surface))
            found.sort(key=lambda x: (x[1], x[2]))
            labels = [
                [f"T{j}", etype, start, end, surface]
                for j, (etype, start, end, surface) in enumerate(found)
            ]
        out.append((text, labels))
    return out
