Feature: Writes on null entities and through pipeline stages

  Scenario: DELETE of a null entity is a no-op
    Given an empty graph
    When executing query:
      """
      OPTIONAL MATCH (x:Nope) DELETE x RETURN 1 AS ok
      """
    Then the result should be, in any order:
      | ok |
      | 1  |

  Scenario: SET on a null entity is a no-op
    Given an empty graph
    When executing query:
      """
      OPTIONAL MATCH (x:Nope) SET x.v = 1 RETURN 1 AS ok
      """
    Then the result should be, in any order:
      | ok |
      | 1  |

  Scenario: REMOVE on a null entity is a no-op
    Given an empty graph
    When executing query:
      """
      OPTIONAL MATCH (x:Nope) REMOVE x.v RETURN 1 AS ok
      """
    Then the result should be, in any order:
      | ok |
      | 1  |

  Scenario: SET a label then scan by it in a later statement
    Given an empty graph
    And having executed:
      """
      CREATE (a:S1 {v: 1}) SET a:S2
      """
    When executing query:
      """
      MATCH (a:S2) RETURN a.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |

  Scenario: UNWIND range CREATE makes one node per element
    Given an empty graph
    And having executed:
      """
      UNWIND range(1, 3) AS i CREATE (:Batch {i: i})
      """
    When executing query:
      """
      MATCH (b:Batch) RETURN count(b) AS c, sum(b.i) AS s
      """
    Then the result should be, in any order:
      | c | s |
      | 3 | 6 |

  Scenario: SET after WITH LIMIT touches only the limited rows
    Given an empty graph
    And having executed:
      """
      CREATE (:L {k: 1}), (:L {k: 2})
      """
    And having executed:
      """
      MATCH (a:L) WITH a ORDER BY a.k LIMIT 1 SET a.touched = true
      """
    When executing query:
      """
      MATCH (a:L) RETURN a.k AS k, a.touched AS t ORDER BY k
      """
    Then the result should be, in order:
      | k | t    |
      | 1 | true |
      | 2 | null |

  Scenario: Multiple SET items and REMOVE in one clause
    Given an empty graph
    And having executed:
      """
      CREATE (:W {a: 1, b: 2, c: 3})
      """
    When executing query:
      """
      MATCH (w:W) SET w.a = 10, w.d = 4 REMOVE w.b
      RETURN w.a AS a, w.b AS b, w.c AS c, w.d AS d
      """
    Then the result should be, in any order:
      | a  | b    | c | d |
      | 10 | null | 3 | 4 |

  Scenario: SET computed from the node being updated
    Given an empty graph
    And having executed:
      """
      CREATE (:W2 {n: 'a'})
      """
    When executing query:
      """
      MATCH (w:W2) SET w.n = w.n + '!' RETURN w.n AS n
      """
    Then the result should be, in any order:
      | n    |
      | 'a!' |

  Scenario: Plus-equals merge keeps unmentioned properties
    Given an empty graph
    And having executed:
      """
      CREATE (:W3 {a: 1, b: 2})
      """
    When executing query:
      """
      MATCH (w:W3) SET w += {b: 20, c: 30}
      RETURN w.a AS a, w.b AS b, w.c AS c
      """
    Then the result should be, in any order:
      | a | b  | c  |
      | 1 | 20 | 30 |

  Scenario: DELETE a relationship leaves its endpoints
    Given an empty graph
    And having executed:
      """
      CREATE (:Src {n: 1})-[:E]->(:Dst {n: 2})
      """
    And having executed:
      """
      MATCH (:Src)-[r:E]->(:Dst) DELETE r
      """
    When executing query:
      """
      MATCH (n) OPTIONAL MATCH (n)-[r]->() RETURN count(n) AS nodes, count(r) AS rels
      """
    Then the result should be, in any order:
      | nodes | rels |
      | 2     | 0    |
