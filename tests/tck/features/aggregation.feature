Feature: Aggregation semantics (TCK clauses/return-aggregation corners)

  Scenario: count ignores nulls but count star does not
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2}), (:P)
      """
    When executing query:
      """
      MATCH (p:P) RETURN count(*) AS star, count(p.v) AS vals
      """
    Then the result should be, in any order:
      | star | vals |
      | 3    | 2    |

  Scenario: count on empty match is zero
    Given an empty graph
    When executing query:
      """
      MATCH (p:Nope) RETURN count(p) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: sum avg min max skip nulls
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 3}), (:P)
      """
    When executing query:
      """
      MATCH (p:P)
      RETURN sum(p.v) AS s, avg(p.v) AS a, min(p.v) AS mn, max(p.v) AS mx
      """
    Then the result should be, in any order:
      | s | a   | mn | mx |
      | 4 | 2.0 | 1  | 3  |

  Scenario: min max of all-null group are null, sum is zero
    Given an empty graph
    And having executed:
      """
      CREATE (:P), (:P)
      """
    When executing query:
      """
      MATCH (p:P) RETURN sum(p.v) AS s, min(p.v) AS mn, avg(p.v) AS a
      """
    Then the result should be, in any order:
      | s | mn   | a    |
      | 0 | null | null |

  Scenario: collect skips nulls
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 2}), (:P), (:P {v: 1})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH p ORDER BY p.v
      RETURN collect(p.v) AS vs
      """
    Then the result should be, in any order:
      | vs     |
      | [1, 2] |

  Scenario: collect DISTINCT deduplicates
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH p ORDER BY p.v
      RETURN collect(DISTINCT p.v) AS vs
      """
    Then the result should be, in any order:
      | vs     |
      | [1, 2] |

  Scenario: count DISTINCT
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 1}), (:P {v: 2}), (:P)
      """
    When executing query:
      """
      MATCH (p:P) RETURN count(DISTINCT p.v) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: Grouping key appears with each aggregate
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a', v: 1}), (:P {g: 'a', v: 2}), (:P {g: 'b', v: 5})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.g AS g, sum(p.v) AS s ORDER BY g
      """
    Then the result should be, in order:
      | g   | s |
      | 'a' | 3 |
      | 'b' | 5 |

  Scenario: Null group key forms its own group
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a', v: 1}), (:P {v: 2}), (:P {v: 3})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.g AS g, sum(p.v) AS s ORDER BY s
      """
    Then the result should be, in any order:
      | g    | s |
      | 'a'  | 1 |
      | null | 5 |

  Scenario: Aggregation without grouping key over empty input yields one row
    Given an empty graph
    When executing query:
      """
      MATCH (p:Nope) RETURN count(p) AS c, sum(p.v) AS s, collect(p.v) AS vs
      """
    Then the result should be, in any order:
      | c | s | vs |
      | 0 | 0 | [] |

  Scenario: Aggregation with grouping key over empty input yields no rows
    Given an empty graph
    When executing query:
      """
      MATCH (p:Nope) RETURN p.g AS g, count(p) AS c
      """
    Then the result should be empty

  Scenario: WITH HAVING-style filter on aggregate
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a', v: 1}), (:P {g: 'a', v: 2}), (:P {g: 'b', v: 5})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH p.g AS g, count(*) AS c
      WHERE c > 1
      RETURN g, c
      """
    Then the result should be, in any order:
      | g   | c |
      | 'a' | 2 |

  Scenario: avg returns float even on integer input
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P) RETURN avg(p.v) AS a
      """
    Then the result should be, in any order:
      | a   |
      | 1.5 |

  Scenario: Aggregate of an expression
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P) RETURN sum(p.v * 2) AS s
      """
    Then the result should be, in any order:
      | s |
      | 6 |

  Scenario: DISTINCT row dedup before aggregation in WITH chain
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH DISTINCT p.v AS v
      RETURN count(v) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: percentileCont midpoint
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 10.0}), (:P {v: 20.0})
      """
    When executing query:
      """
      MATCH (p:P) RETURN percentileCont(p.v, 0.5) AS med
      """
    Then the result should be, in any order:
      | med  |
      | 15.0 |

  Scenario: stDev of a constant column is zero
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 5.0}), (:P {v: 5.0}), (:P {v: 5.0})
      """
    When executing query:
      """
      MATCH (p:P) RETURN stDev(p.v) AS sd
      """
    Then the result should be, in any order:
      | sd  |
      | 0.0 |
