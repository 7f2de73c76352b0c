"""Naive, obviously-correct oracle for the reference drift math.

A direct, dict-and-loop transliteration of the reference Java
(reference: CDCStream/DatabaseStatistics.java, CDCStream/DILCA.java,
CDCStream/DriftDetector.java, CDDA/DriftDetector.java) operating on
blocks given as lists of row-tuples of strings. Deliberately slow and
unvectorized — it exists only to cross-check webvalid.drift.*.
"""

from __future__ import annotations

import math

LOG2 = math.log(2)

JAVA_DOUBLE_MIN = 5e-324
JAVA_DOUBLE_MAX = 1.7976931348623157e308


class OracleStatistics:
    """DatabaseStatistics.java:37-107."""

    def __init__(self, database):
        if len(database) == 0:
            raise ValueError("Database cannot be empty.")
        self.num_attributes = len(database[0])
        m = self.num_attributes
        self.domains = [dict() for _ in range(m)]
        for record in database:
            for i in range(m):
                v = record[i]
                if v not in self.domains[i]:
                    self.domains[i][v] = len(self.domains[i])
        self.cooc = [
            [
                [
                    [0] * len(self.domains[j])
                    for _ in range(len(self.domains[i]))
                ]
                for j in range(m)
            ]
            for i in range(m)
        ]
        for record in database:
            for i in range(m):
                for j in range(m):
                    fi = self.domains[i][record[i]]
                    si = self.domains[j][record[j]]
                    self.cooc[i][j][fi][si] += 1

    def cooccurrences_for(self, i, j):
        return self.cooc[i][j]

    def domain_size(self, i):
        return len(self.domains[i])


def symmetrical_uncertainty(stats, target, attribute):
    """DILCA.java:124-189."""
    if target == attribute:
        return 0.0
    cache = getattr(stats, "_su_cache", None)
    if cache is not None and (target, attribute) in cache:
        return cache[(target, attribute)]
    target_occ = stats.cooccurrences_for(target, target)
    attr_occ = stats.cooccurrences_for(attribute, attribute)
    cooc = stats.cooccurrences_for(attribute, target)

    target_total = 0.0
    for i in range(len(target_occ)):
        target_total += target_occ[i][i]
    target_entropy = 0.0
    for i in range(len(target_occ)):
        occ = target_occ[i][i]
        if occ == 0:
            continue
        p = occ / target_total
        target_entropy -= p * math.log(p) / LOG2

    attr_total = 0.0
    for i in range(len(attr_occ)):
        attr_total += attr_occ[i][i]
    attr_entropy = 0.0
    for i in range(len(attr_occ)):
        occ = attr_occ[i][i]
        if occ == 0:
            continue
        p = occ / attr_total
        attr_entropy -= p * math.log(p) / LOG2

    conditional = 0.0
    for i in range(len(cooc)):
        current = 0.0
        attr_value_total = attr_occ[i][i]
        for j in range(len(cooc[i])):
            occ = cooc[i][j]
            if occ == 0:
                continue
            p = occ / attr_value_total
            current -= p * math.log(p) / LOG2
        conditional += (attr_value_total / attr_total) * current

    if target_entropy == 0 and attr_entropy == 0:
        su = 0.0
    else:
        su = 2 * (target_entropy - conditional) / (target_entropy + attr_entropy)
    if cache is not None:
        cache[(target, attribute)] = su
    return su


def context_attribute_indexes(stats, target):
    """DILCA.java:83-122."""
    m = stats.num_attributes
    uncertainties = {}
    indexes = []
    for i in range(m):
        if i != target:
            indexes.append(i)
            uncertainties[i] = symmetrical_uncertainty(stats, target, i)
    # (int) Math.signum comparator under stable TimSort == stable descending sort
    indexes.sort(key=lambda i: -uncertainties[i])
    for i in range(len(indexes)):
        first = indexes[i]
        if first != -1:
            for j in range(i + 1, len(indexes)):
                second = indexes[j]
                if second != -1 and symmetrical_uncertainty(stats, first, second) <= uncertainties[second]:
                    indexes[j] = -1
    return [i for i in indexes if i != -1]


def distance_matrix_for(stats, target):
    """DILCA.java:35-79. Returns the upper-triangular ragged matrix."""
    context = context_attribute_indexes(stats, target)
    d_t = stats.domain_size(target)
    distances = [[0.0] * (d_t - i - 1) for i in range(d_t - 1)]
    for attr in context:
        cooc = stats.cooccurrences_for(attr, target)
        for i in range(len(cooc)):
            for j in range(d_t):
                for k in range(j + 1, d_t):
                    diff = cooc[i][j] - cooc[i][k]
                    distances[j][k - j - 1] += diff * diff
    total_sizes = 0.0
    for attr in context:
        total_sizes += stats.domain_size(attr)
    for i in range(len(distances)):
        for j in range(len(distances[i])):
            try:
                q = distances[i][j] / total_sizes
            except ZeroDivisionError:
                q = float("nan") if distances[i][j] == 0 else float("inf")
            distances[i][j] = math.sqrt(q) if q >= 0 else float("nan")
    return distances


def normalized_squared_sum_root(distances):
    """DILCA.java:195-209."""
    s = 0.0
    for row in distances:
        for v in row:
            s += v * v
    if s == 0:
        return 0.0
    n = len(distances)
    return (2 * math.sqrt(s)) / (n * (n + 1))


def summary_of(block):
    """CDCStream/DriftDetector.java:122-140."""
    if len(block) == 0:
        raise ValueError("Block should not be empty.")
    return summary_of_statistics(OracleStatistics(block))


def summary_of_statistics(stats):
    """summary_of on a prebuilt statistics object (any object exposing
    num_attributes / domain_size / cooccurrences_for; an optional
    `_su_cache` dict memoizes SU within the block)."""
    m = stats.num_attributes
    summary = 0.0
    for attribute in range(m):
        summary += normalized_squared_sum_root(distance_matrix_for(stats, attribute))
    return summary / m


def _blocks_of(rows, block_size):
    """Tumbling count windows; the last block may be short."""
    return [rows[i: i + block_size] for i in range(0, len(rows), block_size)]


def cdcstream_run(rows, block_size, drift_coefficient=3.0, summary_fn=None):
    """Full CDCStream loop (CDCStream/DriftDetector.java:46-116).

    Returns the printed concept segments as (last_count, current_count)
    pairs, in order. `summary_fn(block)` defaults to summary_of — the
    KDD-scale replay passes a count-table-backed variant that keeps the
    naive DILCA math but builds counts vectorized.
    """
    if summary_fn is None:
        summary_fn = summary_of
    blocks = _blocks_of(rows, block_size)
    segments = []
    summaries = []
    mean = 0.0
    sd = 0.0
    max_sd, min_sd = JAVA_DOUBLE_MIN, JAVA_DOUBLE_MAX
    last_count = current_count = 0
    consumed = 0
    bi = 0
    try:
        for _ in range(2):
            if bi >= len(blocks):
                raise StopIteration
            block = blocks[bi]
            bi += 1
            consumed += len(block)
            summaries.append(summary_fn(block))
        while True:
            current_count = consumed
            if bi >= len(blocks):
                raise StopIteration
            block = blocks[bi]
            bi += 1
            consumed += len(block)
            block_summary = summary_fn(block)
            if len(summaries) > 1:
                mean = 0.0
                for s in summaries:
                    mean += s
                mean /= len(summaries)
                sd = 0.0
                for s in summaries:
                    sd += (s - mean) ** 2
                sd = math.sqrt(sd / len(summaries))
                if max_sd < sd:
                    max_sd = sd
                if min_sd > sd:
                    min_sd = sd
            elif len(summaries) == 1:
                mean = summaries[0]
                sd = (min_sd + max_sd) / 2
            if abs(block_summary - mean) >= drift_coefficient * sd:
                segments.append((last_count, current_count))
                last_count = current_count + 1
                summaries.clear()
            summaries.append(block_summary)
    except StopIteration:
        if current_count >= last_count:
            segments.append((last_count, current_count))
    return segments


def change_degree_for(first_block, second_block):
    """CDDA/DriftDetector.java:82-143."""
    if len(first_block) == 0 or len(second_block) == 0:
        raise ValueError("Blocks should not be empty.")
    m = len(first_block[0])
    if len(second_block[0]) != m:
        raise ValueError("Number of features should match.")
    total_emerging = 0.0
    total_fading = 0.0
    for attribute in range(m):
        first_eq: dict = {}
        second_eq: dict = {}
        for record in first_block:
            v = record[attribute]
            first_eq[v] = first_eq.get(v, 0) + 1
        for record in second_block:
            v = record[attribute]
            second_eq[v] = second_eq.get(v, 0) + 1
        fl = fu = sl = su = 0.0
        for value in set(first_eq) | set(second_eq):
            fc = first_eq.get(value, 0)
            sc = second_eq.get(value, 0)
            if fc > 0:
                if sc > 0:
                    fu += fc
                    su += sc
                else:
                    fl += fc
            elif sc > 0:
                sl += sc
        total_fading += fl / fu if fu else (float("inf") if fl else float("nan"))
        total_emerging += sl / su if su else (float("inf") if sl else float("nan"))
    return (total_emerging + total_fading) / (2 * m)


def cdda_run(rows, block_size, min_change_degree=0.1):
    """Full CDDA loop (CDDA/DriftDetector.java:45-76)."""
    blocks = _blocks_of(rows, block_size)
    segments = []
    last_count = current_count = 0
    consumed = 0
    bi = 0
    try:
        if bi >= len(blocks):
            raise StopIteration
        last_block = blocks[bi]
        bi += 1
        consumed += len(last_block)
        while True:
            current_count = consumed
            if bi >= len(blocks):
                raise StopIteration
            current_block = blocks[bi]
            bi += 1
            consumed += len(current_block)
            degree = change_degree_for(last_block, current_block)
            if degree >= min_change_degree:
                segments.append((last_count, current_count))
                last_count = current_count + 1
            last_block = current_block
    except StopIteration:
        if current_count >= last_count:
            segments.append((last_count, current_count))
    return segments
