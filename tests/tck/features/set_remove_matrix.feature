Feature: SET / REMOVE matrix — property forms, maps, labels

  Scenario: SET a new property then read it back
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})
      """
    And having executed:
      """
      MATCH (p:P) SET p.added = 'x'
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.added AS a
      """
    Then the result should be, in any order:
      | a   |
      | 'x' |

  Scenario: SET overrides an existing property
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1})
      """
    And having executed:
      """
      MATCH (p:P) SET p.v = p.v + 10
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.v AS v
      """
    Then the result should be, in any order:
      | v  |
      | 11 |

  Scenario: SET to null removes the property
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1})
      """
    And having executed:
      """
      MATCH (p:P) SET p.v = null
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.v AS v, 'v' IN keys(p) AS has
      """
    Then the result should be, in any order:
      | v    | has   |
      | null | false |

  Scenario: SET plus-equals merges keeping unmentioned props
    Given an empty graph
    And having executed:
      """
      CREATE (:P {keep: 1, old: 2})
      """
    And having executed:
      """
      MATCH (p:P) SET p += {old: 20, new: 3}
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.keep AS k, p.old AS o, p.new AS n
      """
    Then the result should be, in any order:
      | k | o  | n |
      | 1 | 20 | 3 |

  Scenario: SET equals replaces the whole property map
    Given an empty graph
    And having executed:
      """
      CREATE (:P {gone: 1})
      """
    And having executed:
      """
      MATCH (p:P) SET p = {fresh: 2}
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.gone AS g, p.fresh AS f
      """
    Then the result should be, in any order:
      | g    | f |
      | null | 2 |

  Scenario: SET on a relationship property
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:R {w: 1}]->(:B)
      """
    And having executed:
      """
      MATCH ()-[r:R]->() SET r.w = r.w * 5
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN r.w AS w
      """
    Then the result should be, in any order:
      | w |
      | 5 |

  Scenario: SET multiple items in one clause
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1})
      """
    And having executed:
      """
      MATCH (p:P) SET p.b = 2, p.c = 3
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.a AS a, p.b AS b, p.c AS c
      """
    Then the result should be, in any order:
      | a | b | c |
      | 1 | 2 | 3 |

  Scenario: SET label then match by the new label
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})
      """
    And having executed:
      """
      MATCH (p:P) SET p:Extra
      """
    When executing query:
      """
      MATCH (x:Extra) RETURN x.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |

  Scenario: REMOVE property leaves others intact
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1, b: 2})
      """
    And having executed:
      """
      MATCH (p:P) REMOVE p.a
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.a AS a, p.b AS b
      """
    Then the result should be, in any order:
      | a    | b |
      | null | 2 |

  Scenario: REMOVE label keeps the node under other labels
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1})
      """
    And having executed:
      """
      MATCH (p:P) SET p:Tmp
      """
    And having executed:
      """
      MATCH (p:P) REMOVE p:Tmp
      """
    When executing query:
      """
      MATCH (p:P) RETURN labels(p) AS ls
      """
    Then the result should be, in any order:
      | ls    |
      | ['P'] |

  Scenario: SET filtered subset only
    Given an empty graph
    And having executed:
      """
      CREATE (:P {k: 1}), (:P {k: 2})
      """
    And having executed:
      """
      MATCH (p:P) WHERE p.k > 1 SET p.big = true
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.k AS k, p.big AS b ORDER BY k
      """
    Then the result should be, in order:
      | k | b    |
      | 1 | null |
      | 2 | true |

  Scenario: SET with value computed from another matched node
    Given an empty graph
    And having executed:
      """
      CREATE (:S {v: 10})-[:R]->(:T {v: 0})
      """
    And having executed:
      """
      MATCH (s:S)-[:R]->(t:T) SET t.v = s.v + 1
      """
    When executing query:
      """
      MATCH (t:T) RETURN t.v AS v
      """
    Then the result should be, in any order:
      | v  |
      | 11 |

  Scenario: plus-equals with empty map changes nothing
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1})
      """
    And having executed:
      """
      MATCH (p:P) SET p += {}
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.a AS a
      """
    Then the result should be, in any order:
      | a |
      | 1 |

  Scenario: REMOVE then SET the same property in later statement
    Given an empty graph
    And having executed:
      """
      CREATE (:P {x: 1})
      """
    And having executed:
      """
      MATCH (p:P) REMOVE p.x
      """
    And having executed:
      """
      MATCH (p:P) SET p.x = 99
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.x AS x
      """
    Then the result should be, in any order:
      | x  |
      | 99 |
