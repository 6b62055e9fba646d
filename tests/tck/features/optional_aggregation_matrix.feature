Feature: OPTIONAL MATCH + aggregation interaction matrix

  Scenario: count of an optional variable skips nulls
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})-[:R]->(:Q), (:P {k: 2})
      """
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[:R]->(q:Q)
      RETURN p.k AS k, count(q) AS n ORDER BY k
      """
    Then the result should be, in order:
      | k | n |
      | 1 | 1 |
      | 2 | 0 |

  Scenario: count star counts the row even when optional missed
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})-[:R]->(:Q), (:P {k: 2})
      """
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[:R]->(q:Q)
      RETURN p.k AS k, count(*) AS n ORDER BY k
      """
    Then the result should be, in order:
      | k | n |
      | 1 | 1 |
      | 2 | 1 |

  Scenario: collect of optional property drops nulls
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})-[:R]->(:Q {v: 7}), (:P {k: 2})
      """
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[:R]->(q:Q)
      RETURN collect(q.v) AS vs
      """
    Then the result should be, in any order:
      | vs  |
      | [7] |

  Scenario: sum over only-missed optional is zero
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})
      """
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[:R]->(q:Q)
      RETURN sum(q.v) AS s
      """
    Then the result should be, in any order:
      | s |
      | 0 |

  Scenario: min max avg over only-missed optional are null
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})
      """
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[:R]->(q:Q)
      RETURN min(q.v) AS mn, max(q.v) AS mx, avg(q.v) AS av
      """
    Then the result should be, in any order:
      | mn   | mx   | av   |
      | null | null | null |

  Scenario: optional against an empty graph keeps one all-null row
    Given an empty graph
    When executing query:
      """
      OPTIONAL MATCH (z:Nope) RETURN z, count(*) AS c
      """
    Then the result should be, in any order:
      | z    | c |
      | null | 1 |

  Scenario: optional rows multiply only on hits
    Given an empty graph
    And having executed:
      """
      CREATE (p:P {k: 1})
      """
    And having executed:
      """
      MATCH (p:P) CREATE (p)-[:R]->(:Q {v: 1}), (p)-[:R]->(:Q {v: 2})
      """
    And having executed:
      """
      CREATE (:P {k: 2})
      """
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[:R]->(q:Q)
      RETURN p.k AS k, count(*) AS rows ORDER BY k
      """
    Then the result should be, in order:
      | k | rows |
      | 1 | 2    |
      | 2 | 1    |

  Scenario: grouping key from the optional side can be null
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})-[:R]->(:Q {g: 'x'}), (:P {k: 2})
      """
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[:R]->(q:Q)
      RETURN q.g AS g, count(*) AS n ORDER BY g
      """
    Then the result should be, in order:
      | g    | n |
      | 'x'  | 1 |
      | null | 1 |

  Scenario: WHERE inside optional filters matches without dropping rows
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})-[:R]->(:Q {v: 1}), (:P {k: 2})-[:R]->(:Q {v: 9})
      """
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[:R]->(q:Q) WHERE q.v > 5
      RETURN p.k AS k, q.v AS v ORDER BY k
      """
    Then the result should be, in order:
      | k | v    |
      | 1 | null |
      | 2 | 9    |

  Scenario: WHERE after optional drops null rows
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})-[:R]->(:Q {v: 1}), (:P {k: 2})-[:R]->(:Q {v: 9})
      """
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[:R]->(q:Q)
      WITH p, q WHERE q.v > 5
      RETURN p.k AS k, q.v AS v
      """
    Then the result should be, in any order:
      | k | v |
      | 2 | 9 |

  Scenario: count DISTINCT over optional hits
    Given an empty graph
    And having executed:
      """
      CREATE (p:P {k: 1})
      """
    And having executed:
      """
      MATCH (p:P) CREATE (p)-[:R]->(:Q {v: 1}), (p)-[:R]->(:Q {v: 1})
      """
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[:R]->(q:Q)
      RETURN count(q) AS n, count(DISTINCT q.v) AS d
      """
    Then the result should be, in any order:
      | n | d |
      | 2 | 1 |

  Scenario: two chained optionals preserve earlier nulls
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})
      """
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[:R]->(q:Q)
      OPTIONAL MATCH (q)-[:S]->(r)
      RETURN p.k AS k, q, r
      """
    Then the result should be, in any order:
      | k | q    | r    |
      | 1 | null | null |
