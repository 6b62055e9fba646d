Feature: Aggregation corners (TCK Aggregation; reference aggregate emission
  translator.ts count/sum/collect paths)

  Scenario: count of zero rows is zero
    Given an empty graph
    When executing query:
      """
      MATCH (n:Nope) RETURN count(n) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: count(x) skips nulls, count(*) does not
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2}), (:P)
      """
    When executing query:
      """
      MATCH (p:P) RETURN count(p.v) AS vs, count(*) AS rows
      """
    Then the result should be, in any order:
      | vs | rows |
      | 2  | 3    |

  Scenario: sum over no rows is zero, min and max are null
    Given an empty graph
    When executing query:
      """
      MATCH (n:Nope) RETURN sum(n.v) AS s, min(n.v) AS mn, max(n.v) AS mx
      """
    Then the result should be, in any order:
      | s | mn   | mx   |
      | 0 | null | null |

  Scenario: avg skips nulls in the denominator
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 3}), (:P)
      """
    When executing query:
      """
      MATCH (p:P) RETURN avg(p.v) AS a
      """
    Then the result should be, in any order:
      | a   |
      | 2.0 |

  Scenario: collect skips nulls
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P) RETURN size(collect(p.v)) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: collect over zero rows is the empty list
    Given an empty graph
    When executing query:
      """
      MATCH (n:Nope) RETURN collect(n.v) AS l
      """
    Then the result should be, in any order:
      | l  |
      | [] |

  Scenario: count DISTINCT
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P) RETURN count(DISTINCT p.v) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: sum DISTINCT
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 2}), (:P {v: 2}), (:P {v: 3})
      """
    When executing query:
      """
      MATCH (p:P) RETURN sum(DISTINCT p.v) AS s
      """
    Then the result should be, in any order:
      | s |
      | 5 |

  Scenario: collect DISTINCT
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P) RETURN size(collect(DISTINCT p.v)) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: grouping key with null groups together
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a', v: 1}), (:P {v: 2}), (:P {v: 3})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.g AS g, count(*) AS c ORDER BY g
      """
    Then the result should be, in order:
      | g    | c |
      | 'a'  | 1 |
      | null | 2 |

  Scenario: min and max over strings
    Given an empty graph
    And having executed:
      """
      CREATE (:P {s: 'pear'}), (:P {s: 'apple'}), (:P {s: 'fig'})
      """
    When executing query:
      """
      MATCH (p:P) RETURN min(p.s) AS mn, max(p.s) AS mx
      """
    Then the result should be, in any order:
      | mn      | mx     |
      | 'apple' | 'pear' |

  Scenario: Aggregation mixed with non-aggregates groups implicitly
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'x', v: 1}), (:P {g: 'x', v: 2}), (:P {g: 'y', v: 10})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.g AS g, sum(p.v) AS s, count(*) AS c ORDER BY g
      """
    Then the result should be, in order:
      | g   | s  | c |
      | 'x' | 3  | 2 |
      | 'y' | 10 | 1 |

  Scenario: Aggregate of an expression
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2}), (:P {v: 3})
      """
    When executing query:
      """
      MATCH (p:P) RETURN sum(p.v * 2) AS s, max(p.v + 10) AS m
      """
    Then the result should be, in any order:
      | s  | m  |
      | 12 | 13 |

  Scenario: Expression of an aggregate
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P) RETURN sum(p.v) * 10 AS s
      """
    Then the result should be, in any order:
      | s  |
      | 30 |

  Scenario: avg of integers is a float
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

  Scenario: count(*) with WHERE false is zero not empty
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1})
      """
    When executing query:
      """
      MATCH (p:P) WHERE p.v > 100 RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: Aggregation after WITH carries grouped rows forward
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'x', v: 1}), (:P {g: 'x', v: 2}), (:P {g: 'y', v: 3})
      """
    When executing query:
      """
      MATCH (p:P) WITH p.g AS g, sum(p.v) AS s
      RETURN count(*) AS groups, sum(s) AS total
      """
    Then the result should be, in any order:
      | groups | total |
      | 2      | 6     |

  Scenario: min max of temporal values
    Given an empty graph
    And having executed:
      """
      CREATE (:E {d: date('2024-03-01')}), (:E {d: date('2024-01-15')})
      """
    When executing query:
      """
      MATCH (e:E) RETURN toString(min(e.d)) AS mn, toString(max(e.d)) AS mx
      """
    Then the result should be, in any order:
      | mn           | mx           |
      | '2024-01-15' | '2024-03-01' |

  Scenario: stDev of a single value is zero
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 5})
      """
    When executing query:
      """
      MATCH (p:P) RETURN stDev(p.v) AS sd
      """
    Then the result should be, in any order:
      | sd  |
      | 0.0 |

  Scenario: percentileDisc returns a member of the set
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 10}), (:P {v: 20}), (:P {v: 30}), (:P {v: 40})
      """
    When executing query:
      """
      MATCH (p:P) RETURN percentileDisc(p.v, 0.5) AS p50,
                         percentileDisc(p.v, 0.0) AS p0,
                         percentileDisc(p.v, 1.0) AS p100
      """
    Then the result should be, in any order:
      | p50 | p0 | p100 |
      | 20  | 10 | 40   |

  Scenario: percentileCont interpolates
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 10.0}), (:P {v: 20.0})
      """
    When executing query:
      """
      MATCH (p:P) RETURN percentileCont(p.v, 0.5) AS p50
      """
    Then the result should be, in any order:
      | p50  |
      | 15.0 |

  Scenario: sum of durations adds component groups
    Given an empty graph
    When executing query:
      """
      UNWIND [duration('P1D'), duration('P2DT3H')] AS d
      RETURN toString(sum(d)) AS total
      """
    Then the result should be, in any order:
      | total    |
      | 'P3DT3H' |
