"""Single-node transcription of the reference WikiNER tooling semantics —
the parity twin of operators/wikiner.py, used only by tests.

Faithful to
/root/reference/transner/transner/tools/wikiner_tools/dataset_wikiNER.py
(__read_data:39-82, __parse_sentences:85-116, __convert_to_BIO:140-155)
and wikiNER2CoNLL.py:12-25, minus the torch Dataset plumbing.
"""

from __future__ import annotations


def read_wikiner(path: str) -> tuple[list[list[str]], list[list[str]]]:
    """__read_data: contiguous non-blank lines form one article; tokens
    split on whitespace, triplet split on '|', word = first part,
    label = last part."""
    data: list[list[str]] = []
    targets: list[list[str]] = []
    article_end = True
    just_started = True
    curr_words: list[str] = []
    curr_labels: list[str] = []
    line = "\n"
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            if line == "\n":
                article_end = True
                continue
            if article_end:
                if not just_started:
                    assert len(curr_words) == len(curr_labels)
                    data.append(curr_words)
                    targets.append(curr_labels)
                just_started = False
                curr_words = []
                curr_labels = []
            article_end = False
            for token in line.split():
                triplet = token.split("|")
                assert len(triplet) == 3, "unknown file format"
                curr_words.append(triplet[0])
                curr_labels.append(triplet[-1])
    if line != "\n":
        assert len(curr_words) == len(curr_labels)
        data.append(curr_words)
        targets.append(curr_labels)
    return data, targets


def parse_sentences(
    data: list[list[str]], targets: list[list[str]]
) -> list[tuple[str, list[str]]]:
    """__parse_sentences: '.' closes a sentence (text = words each + ' '
    then '.'; tags include the '.' tag); trailing words after the last
    '.' are dropped."""
    out: list[tuple[str, list[str]]] = []
    for article, tags in zip(data, targets):
        curr_tags: list[str] = []
        curr_sentence = ""
        for word, tag in zip(article, tags):
            if word == ".":
                curr_tags.append(tag)
                out.append((curr_sentence + ".", curr_tags))
                curr_sentence = ""
                curr_tags = []
                continue
            curr_sentence += word + " "
            curr_tags.append(tag)
    return out


def convert_to_bio(tags: list[str]) -> list[str]:
    """__convert_to_BIO, applied per sentence (prev_tag resets)."""
    out = list(tags)
    prev_tag = "O"
    for i, curr_tag in enumerate(tags):
        if curr_tag != "O":
            if prev_tag == "O" or prev_tag[1:] != curr_tag[1:]:
                out[i] = "B" + curr_tag[1:]
        prev_tag = curr_tag
    return out


def to_conll_lines(
    sentences: list[tuple[str, list[str]]], augment: bool = False
) -> list[str]:
    """wikiNER2CoNLL.wikiNER2CoNLL as a line list (no file I/O)."""
    lines: list[str] = []
    for sentence, targets in sentences:
        bio = convert_to_bio(targets)
        assert len(sentence.split()) == len(bio)
        for word, target in zip(sentence.split(), bio):
            lines.append(word + " " + target)
        lines.append("")
        if augment:
            for word, target in zip(sentence.lower().split(), bio):
                lines.append(word + " " + target)
            lines.append("")
    return lines
