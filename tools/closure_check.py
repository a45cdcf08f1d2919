#!/usr/bin/env python3
"""Property test for the min-label-flood closure CTE (VERDICT r17 #1):
the `lp(id, lab)` monotone flood that replaced the O(V·E) `reach`
transitive closure in every keep/cluster oracle must produce exactly
the union-find component-minimum labels on ANY graph. Trials cover
random multigraphs plus the two adversarial chain orderings (ascending
ids — worst case for flood volume — and descending ids).

Run: python3 tools/closure_check.py
"""
import random
import duckdb

Q = """WITH RECURSIVE edges AS MATERIALIZED (
    SELECT id_a AS src, id_b AS dst FROM p
    UNION ALL SELECT id_b, id_a FROM p),
lp(id, lab) AS (
    SELECT src, dst FROM edges WHERE dst < src
    UNION
    SELECT e.dst, l.lab FROM lp l JOIN edges e ON l.id = e.src
      WHERE l.lab < e.dst),
lab AS (SELECT a.id, least(a.id, coalesce(min(l.lab), a.id)) AS cluster
    FROM nodes a LEFT JOIN lp l ON a.id = l.id GROUP BY a.id)
SELECT id, cluster FROM lab"""


def uf_labels(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for v in range(n_nodes):
        comp.setdefault(find(v), []).append(v)
    lab = {}
    for vs in comp.values():
        m = min(vs)
        for v in vs:
            lab[v] = m
    return lab


def main():
    random.seed(42)
    trials = 0
    for trial in range(60):
        n = random.randint(2, 150)
        kind = trial % 3
        if kind == 0:
            edges = [(random.randrange(n), random.randrange(n))
                     for _ in range(random.randint(1, 3 * n))]
            edges = [(a, b) for a, b in edges if a != b]
        elif kind == 1:  # ascending chain: every label floods far
            edges = [(i, i + 1) for i in range(n - 1)]
        else:            # descending chain: every label blocked at once
            edges = [(n - 1 - i, n - 2 - i) for i in range(n - 1)]
        if not edges:
            continue
        want = uf_labels(n, edges)
        con = duckdb.connect()
        con.execute("CREATE TABLE nodes(id BIGINT)")
        con.executemany("INSERT INTO nodes VALUES (?)", [(i,) for i in range(n)])
        con.execute("CREATE TABLE p(id_a BIGINT, id_b BIGINT)")
        con.executemany("INSERT INTO p VALUES (?,?)", edges)
        got = dict(con.execute(Q).fetchall())
        assert got == want, f"trial {trial}: lp != union-find\n{got}\n{want}"
        trials += 1
    print(f"{trials} graph trials: lp closure == union-find component minima")


if __name__ == "__main__":
    main()
