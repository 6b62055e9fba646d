Feature: Pattern predicates nested inside comprehensions, quantifiers, and CASE

  # Round-5 fixed pattern predicates over comprehension/quantifier variables
  # compiling as uncorrelated global EXISTS; this matrix drills the nesting
  # combinations around that fix (openCypher semantics: a pattern predicate
  # is an existential subquery correlated on every bound variable it names).

  Scenario: list comprehension filtered by pattern over the lambda variable
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:L {w: 1}]->(b), (b)-[:L {w: 2}]->(c)
      """
    When executing query:
      """
      MATCH (a:P {name: 'a'})
      RETURN [x IN ['a', 'b', 'c'] WHERE (a)-[:L]->(:P {name: x})] AS xs
      """
    Then the result should be, in any order:
      | xs    |
      | ['b'] |

  Scenario: list comprehension pattern correlates per outer row
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:L]->(b), (b)-[:L]->(c)
      """
    When executing query:
      """
      MATCH (n:P)
      RETURN n.name AS name,
             [x IN ['a', 'b', 'c'] WHERE (n)-[:L]->(:P {name: x})] AS out
      ORDER BY name
      """
    Then the result should be, in order:
      | name | out   |
      | 'a'  | ['b'] |
      | 'b'  | ['c'] |
      | 'c'  | []    |

  Scenario: ANY quantifier with pattern over the lambda variable
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:L]->(b), (b)-[:L]->(c)
      """
    When executing query:
      """
      MATCH (n:P)
      WHERE ANY(x IN ['c'] WHERE (n)-[:L]->(:P {name: x}))
      RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'b'  |

  Scenario: NONE quantifier with pattern over the lambda variable
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:L]->(b), (b)-[:L]->(c)
      """
    When executing query:
      """
      MATCH (n:P)
      WHERE NONE(x IN ['b', 'c'] WHERE (n)-[:L]->(:P {name: x}))
      RETURN n.name AS name ORDER BY name
      """
    Then the result should be, in order:
      | name |
      | 'c'  |

  Scenario: ALL quantifier with pattern over the lambda variable
    Given an empty graph
    And having executed:
      """
      CREATE (h:P {name: 'hub'}), (x:P {name: 'x'}), (y:P {name: 'y'}),
             (h)-[:L]->(x), (h)-[:L]->(y), (x)-[:L]->(y)
      """
    When executing query:
      """
      MATCH (n:P)
      WHERE ALL(t IN ['x', 'y'] WHERE (n)-[:L]->(:P {name: t}))
      RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name  |
      | 'hub' |

  Scenario: SINGLE quantifier with pattern over the lambda variable
    Given an empty graph
    And having executed:
      """
      CREATE (h:P {name: 'hub'}), (x:P {name: 'x'}), (y:P {name: 'y'}),
             (h)-[:L]->(x), (h)-[:L]->(y), (x)-[:L]->(y)
      """
    When executing query:
      """
      MATCH (n:P)
      WHERE SINGLE(t IN ['x', 'y'] WHERE (n)-[:L]->(:P {name: t}))
      RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'x'  |

  Scenario: negated pattern inside a quantifier
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:L]->(b)
      """
    When executing query:
      """
      MATCH (n:P)
      WHERE ANY(x IN ['b'] WHERE NOT (n)-[:L]->(:P {name: x}))
      RETURN n.name AS name ORDER BY name
      """
    Then the result should be, in order:
      | name |
      | 'b'  |
      | 'c'  |

  Scenario: pattern predicate in a nested list comprehension
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}),
             (a)-[:L]->(b)
      """
    When executing query:
      """
      MATCH (a:P {name: 'a'})
      RETURN [x IN [1, 2] | [y IN ['a', 'b'] WHERE (a)-[:L]->(:P {name: y}) | x * 10]] AS zz
      """
    Then the result should be, in any order:
      | zz           |
      | [[10], [20]] |

  Scenario: comprehension over node list with pattern over elements
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:L]->(b), (b)-[:L]->(c)
      """
    When executing query:
      """
      MATCH (m:P)
      WITH collect(m) AS ms
      RETURN [n IN ms WHERE (n)-[:L]->() | n.name] AS sources
      """
    Then the result should be, in any order:
      | sources    |
      | ['a', 'b'] |

  Scenario: quantifier over collected nodes with pattern over elements
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:L]->(b), (b)-[:L]->(c)
      """
    When executing query:
      """
      MATCH (m:P) WITH collect(m) AS ms
      RETURN ANY(n IN ms WHERE (n)-[:L]->(:P {name: 'c'})) AS has_pre_c,
             ALL(n IN ms WHERE (n)-[:L]->()) AS all_sources
      """
    Then the result should be, in any order:
      | has_pre_c | all_sources |
      | true      | false       |

  Scenario: CASE with a pattern predicate inside a comprehension
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}),
             (a)-[:L]->(b)
      """
    When executing query:
      """
      MATCH (m:P) WITH collect(m) AS ms
      RETURN [n IN ms | CASE WHEN (n)-[:L]->() THEN n.name ELSE '-' END] AS tags
      """
    Then the result should be, in any order:
      | tags       |
      | ['a', '-'] |

  Scenario: pattern predicate over UNWIND variable
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:L]->(b), (b)-[:L]->(c)
      """
    When executing query:
      """
      MATCH (n:P) WITH collect(n) AS ns
      UNWIND ns AS n
      WITH n WHERE (n)-[:L]->(:P {name: 'c'})
      RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'b'  |

  Scenario: pattern with relationship property filter over lambda variable
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:L {w: 1}]->(b), (a)-[:L {w: 9}]->(c)
      """
    When executing query:
      """
      MATCH (a:P {name: 'a'})
      RETURN [x IN ['b', 'c'] WHERE (a)-[:L {w: 1}]->(:P {name: x})] AS xs
      """
    Then the result should be, in any order:
      | xs    |
      | ['b'] |

  Scenario: incoming-direction pattern over lambda variable
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:L]->(b), (b)-[:L]->(c)
      """
    When executing query:
      """
      MATCH (n:P)
      WHERE ANY(x IN ['a'] WHERE (n)<-[:L]-(:P {name: x}))
      RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'b'  |

  Scenario: undirected pattern inside quantifier
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:L]->(b)
      """
    When executing query:
      """
      MATCH (n:P)
      WHERE ANY(x IN ['a', 'c'] WHERE (n)-[:L]-(:P {name: x}))
      RETURN n.name AS name ORDER BY name
      """
    Then the result should be, in order:
      | name |
      | 'b'  |

  Scenario: pattern predicate in WHERE of a pattern comprehension
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:L]->(b), (b)-[:L]->(c)
      """
    When executing query:
      """
      MATCH (a:P {name: 'a'})
      RETURN [(a)-[:L]->(m) WHERE (m)-[:L]->() | m.name] AS mids
      """
    Then the result should be, in any order:
      | mids  |
      | ['b'] |

  Scenario: two pattern predicates on the same lambda variable conjoined
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:L]->(b), (b)-[:L]->(c), (a)-[:L]->(c)
      """
    When executing query:
      """
      MATCH (m:P) WITH collect(m) AS ms
      RETURN [n IN ms WHERE (n)-[:L]->() AND ()-[:L]->(n) | n.name] AS mid
      """
    Then the result should be, in any order:
      | mid   |
      | ['b'] |

  Scenario: pattern predicate referencing outer AND lambda variables together
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:L]->(b), (a)-[:L]->(c), (b)-[:L]->(c)
      """
    When executing query:
      """
      MATCH (src:P {name: 'a'})
      MATCH (t:P) WITH src, collect(t) AS ts
      RETURN [n IN ts WHERE (src)-[:L]->(n) | n.name] AS direct
      """
    Then the result should be, in any order:
      | direct     |
      | ['b', 'c'] |

  Scenario: quantifier over empty list with pattern is vacuous
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})
      """
    When executing query:
      """
      MATCH (n:P)
      RETURN ALL(x IN [] WHERE (n)-[:L]->({name: x})) AS all_e,
             ANY(x IN [] WHERE (n)-[:L]->({name: x})) AS any_e,
             NONE(x IN [] WHERE (n)-[:L]->({name: x})) AS none_e,
             SINGLE(x IN [] WHERE (n)-[:L]->({name: x})) AS single_e
      """
    Then the result should be, in any order:
      | all_e | any_e | none_e | single_e |
      | true  | false | true   | false    |

  Scenario: pattern predicate inside reduce via CASE
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:L]->(b), (b)-[:L]->(c)
      """
    When executing query:
      """
      MATCH (m:P) WITH collect(m) AS ms
      RETURN reduce(acc = 0, n IN ms |
               acc + CASE WHEN (n)-[:L]->() THEN 1 ELSE 0 END) AS n_sources
      """
    Then the result should be, in any order:
      | n_sources |
      | 2         |

  Scenario: size of filtered comprehension with pattern predicate
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:L]->(b), (a)-[:L]->(c)
      """
    When executing query:
      """
      MATCH (a:P {name: 'a'})
      RETURN size([x IN ['a', 'b', 'c'] WHERE (a)-[:L]->(:P {name: x})]) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: pattern over lambda variable in ORDER BY expression
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:L]->(b), (b)-[:L]->(c)
      """
    When executing query:
      """
      MATCH (n:P)
      RETURN n.name AS name
      ORDER BY size([x IN ['a', 'b', 'c'] WHERE (n)-[:L]->(:P {name: x})]) DESC,
               name
      LIMIT 2
      """
    Then the result should be, in order:
      | name |
      | 'a'  |
      | 'b'  |

  Scenario: null list element makes the pattern predicate filter it out
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (a)-[:L]->(b)
      """
    When executing query:
      """
      MATCH (a:P {name: 'a'})
      RETURN [x IN ['b', null] WHERE (a)-[:L]->(:P {name: x})] AS xs
      """
    Then the result should be, in any order:
      | xs    |
      | ['b'] |

  Scenario: quantifier pattern over lambda variable after OPTIONAL MATCH miss
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})
      """
    When executing query:
      """
      MATCH (a:P {name: 'a'})
      OPTIONAL MATCH (a)-[:L]->(m)
      WITH collect(m) AS ms
      RETURN ANY(n IN ms WHERE (n)-[:L]->()) AS any_src
      """
    Then the result should be, in any order:
      | any_src |
      | false   |
