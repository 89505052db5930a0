"""Faithful-mode file-contract + quirk tests (SURVEY.md §5.2.3/.4).

The expected outputs are produced by a pure-Python hand-simulation of
the reference's semantics (hw4.cc:457-487, 350-357) on tiny inputs —
tokenizer quirks Q1/Q2, first-char partitioner Q3, ascending/descending
sort, ``"word count"`` formatting.
"""

import os
from collections import Counter

import pytest

from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.operators.mapreduce import (
    JobConfig,
    run_job,
)

LINES = [
    "apple banana apple cherry ",
    "banana date egg ",
    "fig grape apple ",
    "egg fig banana date ",
]


def reference_sim(lines, chunk_size, num_reducer, *, drop_trailing, fuse):
    """Hand-simulation of hw4.cc's map path: chunk (Q2), tokenize (Q1),
    count, partition by ord(word[0]) % R (Q3)."""
    sep = "" if fuse else " "
    chunks = [
        sep.join(lines[i : i + chunk_size]) for i in range(0, len(lines), chunk_size)
    ]
    words = []
    for chunk in chunks:
        if drop_trailing:
            # hw4.cc:460-465: emit token before each space; drop the rest
            parts = chunk.split(" ")
            words.extend(parts[:-1])  # empties included — faithful
        else:
            words.extend(w for w in chunk.split(" ") if w)
    counts = Counter(words)
    files = {r: [] for r in range(num_reducer)}
    for word, cnt in counts.items():
        pid = (ord(word[0]) if word else 0) % num_reducer
        files[pid].append((word, cnt))
    return {r: sorted(pairs) for r, pairs in files.items()}


@pytest.fixture
def input_file(tmp_path):
    p = tmp_path / "input.txt"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


@pytest.fixture
def locality_file(tmp_path):
    p = tmp_path / "locality.txt"
    p.write_text("1 2\n2 5\n")
    return str(p)


def run(spark, tmp_path, input_file, locality_file, **flags):
    cfg = JobConfig(
        job_name="wc",
        num_reducer=3,
        delay=0,
        input_path=input_file,
        chunk_size=2,
        locality_config=locality_file,
        output_dir=str(tmp_path / "out"),
        **flags,
    )
    return cfg, run_job(spark, cfg)


def read_out(path):
    with open(path) as f:
        return [
            (line.rsplit(" ", 1)[0], int(line.rsplit(" ", 1)[1]))
            for line in f.read().splitlines()
            if line
        ]


def test_file_contract_faithful(spark, tmp_path, input_file, locality_file):
    cfg, outputs = run(
        spark,
        tmp_path,
        input_file,
        locality_file,
        drop_trailing_token=True,
        fuse_chunk_lines=True,
        partition_fn="first_char",
    )
    expected = reference_sim(LINES, 2, 3, drop_trailing=True, fuse=True)
    for r in range(3):
        path = os.path.join(cfg.output_dir, f"wc-{r + 1}.out")
        assert os.path.exists(path), f"missing reducer file {r + 1}"
        got = read_out(path)
        assert got == expected[r], f"reducer {r}: {got} != {expected[r]}"
        # internally sorted ascending (hw4.cc:333)
        assert got == sorted(got)


def test_fixed_mode_counts(spark, tmp_path, input_file, locality_file):
    """Default flags fix Q1/Q2: every token counted, lines separated."""
    cfg, _ = run(spark, tmp_path, input_file, locality_file, partition_fn="first_char")
    expected = reference_sim(LINES, 2, 3, drop_trailing=False, fuse=False)
    all_got = []
    for r in range(3):
        all_got += read_out(os.path.join(cfg.output_dir, f"wc-{r + 1}.out"))
    assert sorted(all_got) == sorted(p for pairs in expected.values() for p in pairs)
    # trailing-space input means every word survives even under Q1, so
    # fixed-mode total must equal the raw token count
    assert sum(c for _, c in all_got) == sum(len(l.split()) for l in LINES)


def test_quirk_q1_drops_trailing_token(spark, tmp_path, locality_file):
    """Without trailing spaces, Q1 visibly eats each chunk's last token."""
    p = tmp_path / "nospace.txt"
    p.write_text("alpha beta\ngamma delta\n")  # no trailing spaces
    cfg = JobConfig(
        "q1", 2, 0, str(p), 1, str(locality_file), str(tmp_path / "o1"),
        drop_trailing_token=True, partition_fn="first_char",
    )
    run_job(spark, cfg)
    got = []
    for r in (1, 2):
        got += read_out(os.path.join(cfg.output_dir, f"q1-{r}.out"))
    # chunk 'alpha beta' → only 'alpha'; 'gamma delta' → only 'gamma'
    assert sorted(got) == [("alpha", 1), ("gamma", 1)]


def test_quirk_q2_fuses_lines(spark, tmp_path, locality_file):
    p = tmp_path / "fuse.txt"
    p.write_text("one two\nthree four\n")  # no trailing spaces
    cfg = JobConfig(
        "q2", 2, 0, str(p), 2, str(locality_file), str(tmp_path / "o2"),
        fuse_chunk_lines=True, partition_fn="first_char",
    )
    run_job(spark, cfg)
    got = []
    for r in (1, 2):
        got += read_out(os.path.join(cfg.output_dir, f"q2-{r}.out"))
    # 'one two' + 'three four' fuse to 'one twothree four'
    assert sorted(got) == [("four", 1), ("one", 1), ("twothree", 1)]


def test_sort_descending(spark, tmp_path, input_file, locality_file):
    cfg, _ = run(
        spark, tmp_path, input_file, locality_file,
        partition_fn="first_char", sort_ascending=False,
    )
    for r in range(3):
        got = read_out(os.path.join(cfg.output_dir, f"wc-{r + 1}.out"))
        assert got == sorted(got, reverse=True)


def test_event_log_vocabulary(spark, tmp_path, input_file, locality_file):
    """FIXTURES.md A4: assert vocabulary/arity, not timings."""
    cfg, outputs = run(spark, tmp_path, input_file, locality_file)
    lines = open(outputs["log"]).read().splitlines()
    kinds = [l.split(",")[1] for l in lines]
    assert kinds[0] == "Start_Job" and kinds[-1] == "Finish_Job"
    assert kinds.count("Dispatch_MapTask") == 2  # one per locality entry (Q7 parity)
    assert kinds.count("Complete_MapTask") == 2
    assert kinds.count("Dispatch_ReduceTask") == 3
    assert kinds.count("Complete_ReduceTask") == 3
    arity = {
        "Start_Job": 9, "Dispatch_MapTask": 4, "Complete_MapTask": 4,
        "Dispatch_ReduceTask": 4, "Complete_ReduceTask": 4, "Finish_Job": 3,
    }
    for l in lines:
        parts = l.split(",")
        assert len(parts) == arity[parts[1]], l


def test_hash_partitioner_covers_all_words(spark, tmp_path, input_file, locality_file):
    cfg, _ = run(spark, tmp_path, input_file, locality_file, partition_fn="hash")
    all_got = []
    for r in range(3):
        all_got += read_out(os.path.join(cfg.output_dir, f"wc-{r + 1}.out"))
    assert sum(c for _, c in all_got) == sum(len(l.split()) for l in LINES)


def test_custom_map_and_reduce_hooks(spark, tmp_path, input_file, locality_file):
    """Pluggable map/reduce closures (the generalization of hw4.cc:32-40):
    map word → (first_letter, len(word)), reduce → max — per-initial
    longest word length, validated against a pure-Python model."""
    cfg = JobConfig(
        "hooks", 2, 0, input_file, 2, locality_file, str(tmp_path / "oh"),
        partition_fn="first_char",
        map_fn=lambda w: (w[0], len(w)),
        custom_reduce=max,
    )
    run_job(spark, cfg)
    got = {}
    for r in (1, 2):
        got.update(dict(read_out(os.path.join(cfg.output_dir, f"hooks-{r}.out"))))
    expected = {}
    for line in LINES:
        for w in line.split():
            expected[w[0]] = max(expected.get(w[0], 0), len(w))
    assert got == expected


def test_event_log_per_task_timings(spark, tmp_path, input_file, locality_file):
    """hw4.cc:153 contract: Complete_MapTask/Complete_ReduceTask rows
    carry per-task ms. The values must be the scheduler's own TaskEnd
    measurements (surfaced in run_job's return), not one shared
    aggregate (the round-2 deviation): reduce rows map 1:1 onto the
    R-task write stage; map rows cycle through the upstream stages'
    real task times."""
    cfg, outputs = run(spark, tmp_path, input_file, locality_file)
    map_ms, red_ms = outputs["map_task_ms"], outputs["reduce_task_ms"]
    assert map_ms and all(isinstance(m, int) and m >= 0 for m in map_ms)
    # the pid repartition pins the write stage to exactly R tasks
    assert len(red_ms) == cfg.num_reducer
    lines = open(outputs["log"]).read().splitlines()
    logged_map = [
        int(l.split(",")[3]) for l in lines if l.split(",")[1] == "Complete_MapTask"
    ]
    logged_red = [
        int(l.split(",")[3]) for l in lines if l.split(",")[1] == "Complete_ReduceTask"
    ]
    assert logged_map == [map_ms[i % len(map_ms)] for i in range(len(logged_map))]
    assert logged_red == red_ms
