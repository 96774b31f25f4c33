"""TextFlux prompt templates.

Two-template scheme (reference: /root/reference/run_inference.py:27-40,102-103):
the *generic* template (no word list) goes to CLIP (`prompt`), the *word-list*
template goes to T5 (`prompt_2`).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

GENERIC_TEMPLATE = (
    "The pair of images highlights some white words on a black background, "
    "as well as their style on a real-world scene image. "
    "[IMAGE1] is a template image rendering the text, with the words; "
    "[IMAGE2] shows the text content naturally and correspondingly integrated into the image."
)

WORDS_TEMPLATE = (
    "The pair of images highlights some white words on a black background, "
    "as well as their style on a real-world scene image. "
    "[IMAGE1] is a template image rendering the text, with the words {words}; "
    "[IMAGE2] shows the text content {words} naturally and correspondingly integrated into the image."
)


def words_prompt(words: Sequence[str]) -> str:
    words_str = ", ".join(f"'{w}'" for w in words)
    return WORDS_TEMPLATE.format(words=words_str)


def build_prompts(words: Sequence[str]) -> Tuple[str, str]:
    """Returns (clip_prompt, t5_prompt)."""
    return GENERIC_TEMPLATE, words_prompt(words)


def find_render_token_windows(tokenize, prompt: str, max_length: int = 512):
    """Locate the T5 token windows of the quoted render words inside a prompt.

    Port of the reference's get_text_to_render matching
    (/root/reference/diffusers/.../pipeline_flux.py:197-268): extract
    `'word'`-quoted spans, tokenize each without padding, and slide over the
    full prompt's ids to find the span indices. Returns a list of
    (word, start, end) tuples (end exclusive); used to build per-token
    attention weightings (e.g. the spatial AMO variant).
    """
    import re

    full_ids = [int(t) for t in np.asarray(tokenize(prompt)).ravel()]
    windows = []
    for match in re.findall(r"'([^']*)'", prompt):
        word_ids = [int(t) for t in np.asarray(tokenize(match)).ravel()]
        # strip padding / trailing special ids: keep the longest prefix that
        # occurs contiguously in the full sequence
        for trim in range(len(word_ids), 0, -1):
            needle = word_ids[:trim]
            for start in range(0, min(len(full_ids), max_length) - trim + 1):
                if full_ids[start:start + trim] == needle:
                    windows.append((match, start, start + trim))
                    break
            else:
                continue
            break
    return windows


def read_words(text_or_path: str) -> List[str]:
    """Read non-empty lines from a file path or a raw newline-separated string."""
    import os

    if isinstance(text_or_path, str) and os.path.exists(text_or_path):
        with open(text_or_path, encoding="utf-8") as f:
            return [line.strip() for line in f if line.strip()]
    return [line.strip() for line in text_or_path.splitlines() if line.strip()]
