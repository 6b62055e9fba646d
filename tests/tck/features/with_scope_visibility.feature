Feature: WITH scope visibility matrix — what survives, shadows, and errors

  Scenario: WITH drops unprojected variables
    Given an empty graph
    And having executed:
      """
      CREATE (:P {x: 1, y: 2})
      """
    When executing query:
      """
      MATCH (p:P) WITH p.x AS x RETURN p.y AS y
      """
    Then a SyntaxError should be raised

  Scenario: WITH keeps only listed node variables
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1})-[:R]->(:B {v: 2})
      """
    When executing query:
      """
      MATCH (a:A)-[r:R]->(b:B) WITH a RETURN b.v AS v
      """
    Then a SyntaxError should be raised

  Scenario: WITH a keeps the node var usable downstream
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1})-[:R]->(:B {v: 2})
      """
    When executing query:
      """
      MATCH (a:A)-[:R]->(b:B) WITH a RETURN a.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |

  Scenario: alias shadows the original variable name
    Given an empty graph
    And having executed:
      """
      CREATE (:P {x: 7})
      """
    When executing query:
      """
      MATCH (p:P) WITH p.x AS p RETURN p
      """
    Then the result should be, in any order:
      | p |
      | 7 |

  Scenario: WITH both node and derived value
    Given an empty graph
    And having executed:
      """
      CREATE (:P {x: 3})
      """
    When executing query:
      """
      MATCH (p:P) WITH p, p.x * 2 AS d RETURN p.x AS x, d
      """
    Then the result should be, in any order:
      | x | d |
      | 3 | 6 |

  Scenario: WHERE after WITH filters on the projected alias
    Given an empty graph
    And having executed:
      """
      CREATE (:P {x: 1}), (:P {x: 5})
      """
    When executing query:
      """
      MATCH (p:P) WITH p.x AS x WHERE x > 2 RETURN x
      """
    Then the result should be, in any order:
      | x |
      | 5 |

  Scenario: WHERE after WITH cannot use a dropped variable
    Given an empty graph
    And having executed:
      """
      CREATE (:P {x: 1})
      """
    When executing query:
      """
      MATCH (p:P) WITH p.x AS x WHERE p.x > 0 RETURN x
      """
    Then a SyntaxError should be raised

  Scenario: chained WITH narrows scope step by step
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1, b: 2, c: 3})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH p.a AS a, p.b AS b
      WITH a
      RETURN a
      """
    Then the result should be, in any order:
      | a |
      | 1 |

  Scenario: chained WITH cannot resurrect a dropped alias
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1, b: 2})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH p.a AS a, p.b AS b
      WITH a
      RETURN b
      """
    Then a SyntaxError should be raised

  Scenario: WITH star carries everything forward
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1})-[:R {w: 9}]->(:B {v: 2})
      """
    When executing query:
      """
      MATCH (a:A)-[r:R]->(b:B)
      WITH *
      RETURN a.v AS av, r.w AS rw, b.v AS bv
      """
    Then the result should be, in any order:
      | av | rw | bv |
      | 1  | 9  | 2  |

  Scenario: aggregation in WITH groups by the other projected items
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a', v: 1}), (:P {g: 'a', v: 2}), (:P {g: 'b', v: 10})
      """
    When executing query:
      """
      MATCH (p:P) WITH p.g AS g, sum(p.v) AS s RETURN g, s ORDER BY g
      """
    Then the result should be, in order:
      | g   | s  |
      | 'a' | 3  |
      | 'b' | 10 |

  Scenario: variable introduced by UNWIND visible after plain WITH
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS x WITH x, x * 10 AS y RETURN x + y AS t ORDER BY t
      """
    Then the result should be, in order:
      | t  |
      | 11 |
      | 22 |

  Scenario: UNWIND variable dropped by projecting something else
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS x WITH x * 10 AS y RETURN x
      """
    Then a SyntaxError should be raised

  Scenario: later MATCH correlates on a WITH-carried node
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {v: 1})-[:R]->(:B {v: 2})
      """
    When executing query:
      """
      MATCH (a:A) WITH a MATCH (a)-[:R]->(b:B) RETURN b.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 2 |

  Scenario: WITH DISTINCT deduplicates the projected tuple
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a'}), (:P {g: 'a'}), (:P {g: 'b'})
      """
    When executing query:
      """
      MATCH (p:P) WITH DISTINCT p.g AS g RETURN g ORDER BY g
      """
    Then the result should be, in order:
      | g   |
      | 'a' |
      | 'b' |

  Scenario: alias may reuse the name it replaces
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS x WITH x + 1 AS x RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x |
      | 2 |
      | 3 |

  Scenario: RETURN star after WITH star
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 4})
      """
    When executing query:
      """
      MATCH (p:P) WITH p.v AS v WITH * RETURN *
      """
    Then the result should be, in any order:
      | v |
      | 4 |

  Scenario: scalar subexpression uses only in-scope aliases
    Given an empty graph
    When executing query:
      """
      UNWIND [3] AS x
      WITH x AS y
      RETURN y * y AS sq
      """
    Then the result should be, in any order:
      | sq |
      | 9  |

  Scenario: WITH LIMIT then aggregate sees the limited rows
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3, 4] AS x
      WITH x ORDER BY x LIMIT 2
      RETURN sum(x) AS s
      """
    Then the result should be, in any order:
      | s |
      | 3 |

  Scenario: WITH SKIP drops leading rows in the declared order
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3, 4] AS x
      WITH x ORDER BY x DESC SKIP 1
      RETURN collect(x) AS rest
      """
    Then the result should be, in any order:
      | rest      |
      | [3, 2, 1] |

  Scenario: two UNWINDs cross-multiply within scope
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS a
      UNWIND [10, 20] AS b
      RETURN a + b AS s ORDER BY s
      """
    Then the result should be, in order:
      | s  |
      | 11 |
      | 12 |
      | 21 |
      | 22 |

  Scenario: aggregate alias usable in the next WHERE (HAVING)
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a', v: 1}), (:P {g: 'a', v: 2}), (:P {g: 'b', v: 1})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH p.g AS g, count(*) AS n
      WHERE n > 1
      RETURN g
      """
    Then the result should be, in any order:
      | g   |
      | 'a' |

  Scenario: ORDER BY in WITH can use an incoming variable being projected
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 2}), (:P {v: 1})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH p.v AS v ORDER BY p.v DESC
      RETURN collect(v) AS vs
      """
    Then the result should be, in any order:
      | vs     |
      | [2, 1] |

  Scenario: RETURN cannot see variables from before two WITH hops
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1})
      """
    When executing query:
      """
      MATCH (p:P) WITH p.a AS a WITH a + 1 AS b RETURN p.a
      """
    Then a SyntaxError should be raised

  Scenario: expression alias vs bare variable keep distinct names
    Given an empty graph
    When executing query:
      """
      UNWIND [5] AS x WITH x, x AS y RETURN x, y
      """
    Then the result should be, in any order:
      | x | y |
      | 5 | 5 |

  Scenario: OPTIONAL MATCH after WITH sees carried variable
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1})
      """
    When executing query:
      """
      MATCH (a:A)
      WITH a
      OPTIONAL MATCH (a)-[:NOPE]->(x)
      RETURN a.v AS v, x
      """
    Then the result should be, in any order:
      | v | x    |
      | 1 | null |

  Scenario: UNWIND of a collected alias re-expands in new scope
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P)
      WITH collect(p.v) AS vs
      UNWIND vs AS v
      WITH v WHERE v > 1
      RETURN v
      """
    Then the result should be, in any order:
      | v |
      | 2 |

  Scenario: WITH false-filtering keeps downstream clauses row-free
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1})
      """
    When executing query:
      """
      MATCH (p:P) WITH p WHERE p.v > 99 RETURN p.v AS v
      """
    Then the result should be empty

  Scenario: aggregate cannot be used directly in WITH WHERE of same scope
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1})
      """
    When executing query:
      """
      MATCH (p:P) WITH p WHERE count(*) > 0 RETURN p.v AS v
      """
    Then a SyntaxError should be raised
