Feature: Graph function and error-surface corners (id/labels/type/properties,
  unknown functions, arity errors)

  Scenario: id() values are distinct per node
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 2}), (:N {v: 3})
      """
    When executing query:
      """
      MATCH (n:N) RETURN count(DISTINCT id(n)) AS ids
      """
    Then the result should be, in any order:
      | ids |
      | 3   |

  Scenario: labels() on a freshly created multi-label node
    Given an empty graph
    And having executed:
      """
      CREATE (:A:B {v: 1})
      """
    When executing query:
      """
      MATCH (n:A) RETURN labels(n) AS ls
      """
    Then the result should be, in any order:
      | ls         |
      | ['A', 'B'] |

  Scenario: Multi-label pattern matches only the intersection
    Given an empty graph
    And having executed:
      """
      CREATE (:A:B {v: 1}), (:A {v: 2})
      """
    When executing query:
      """
      MATCH (n:A:B) RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |

  Scenario: type() grouped in aggregation
    Given an empty graph
    And having executed:
      """
      CREATE (a:N) CREATE (a)-[:X]->(:N) CREATE (a)-[:X]->(:N) CREATE (a)-[:Y]->(:N)
      """
    When executing query:
      """
      MATCH ()-[r]->() RETURN type(r) AS t, count(*) AS c ORDER BY t
      """
    Then the result should be, in order:
      | t   | c |
      | 'X' | 2 |
      | 'Y' | 1 |

  Scenario: properties() reflects only set properties
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: 1})
      """
    When executing query:
      """
      MATCH (p:P) RETURN keys(properties(p)) AS ks
      """
    Then the result should be, in any order:
      | ks    |
      | ['a'] |

  Scenario: Unknown function is an error
    Given an empty graph
    When executing query:
      """
      RETURN totallyNotAFunction(1) AS x
      """
    Then a SyntaxError should be raised

  Scenario: id() of a relationship differs from its nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:R]->(:B)
      """
    When executing query:
      """
      MATCH (a)-[r]->(b)
      RETURN id(r) <> id(a) AS ra, id(r) <> id(b) AS rb
      """
    Then the result should be, in any order:
      | ra   | rb   |
      | true | true |

  Scenario: startNode and endNode identify the direction
    Given an empty graph
    And having executed:
      """
      CREATE (:A {side: 'src'})-[:R]->(:B {side: 'dst'})
      """
    When executing query:
      """
      MATCH (a:A)-[r:R]->(b:B)
      RETURN startNode(r) = id(a) AS s, endNode(r) = id(b) AS e
      """
    Then the result should be, in any order:
      | s    | e    |
      | true | true |

  Scenario: timestamp() is a non-negative integer
    Given an empty graph
    When executing query:
      """
      RETURN timestamp() >= 0 AS ok
      """
    Then the result should be, in any order:
      | ok   |
      | true |

  Scenario: randomUUID() returns distinct values
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS i
      WITH randomUUID() AS u
      RETURN count(DISTINCT u) AS c
      """
    Then the result should be, in any order:
      | c |
      | 3 |

  Scenario: coalesce over missing properties picks the first present
    Given an empty graph
    And having executed:
      """
      CREATE (:P {b: 2}), (:P {a: 1, b: 9})
      """
    When executing query:
      """
      MATCH (p:P) RETURN coalesce(p.a, p.b, 0) AS v ORDER BY v
      """
    Then the result should be, in order:
      | v |
      | 1 |
      | 2 |

  Scenario: CALL db.labels lists created labels
    Given an empty graph
    And having executed:
      """
      CREATE (:Alpha), (:Beta)
      """
    When executing query:
      """
      CALL db.labels()
      """
    Then the result should be, in any order:
      | label   |
      | 'Alpha' |
      | 'Beta'  |

  Scenario: CALL db.relationshipTypes lists created types
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:REL1]->(:B), (:A)-[:REL2]->(:B)
      """
    When executing query:
      """
      CALL db.relationshipTypes()
      """
    Then the result should be, in any order:
      | relationshipType |
      | 'REL1'           |
      | 'REL2'           |

  Scenario: Property access on a relationship variable
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:R {w: 3, tag: 'x'}]->(:B)
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN r.w AS w, r.tag AS tag, r.missing AS m
      """
    Then the result should be, in any order:
      | w | tag | m    |
      | 3 | 'x' | null |

  Scenario: size of a pattern comprehension
    Given an empty graph
    And having executed:
      """
      CREATE (a:A) CREATE (a)-[:R]->(:B) CREATE (a)-[:R]->(:B)
      """
    When executing query:
      """
      MATCH (a:A) RETURN size([(a)-[:R]->(b) | b]) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: Arithmetic null propagation through functions
    Given an empty graph
    And having executed:
      """
      CREATE (:P)
      """
    When executing query:
      """
      MATCH (p:P)
      RETURN abs(p.missing) AS a, toUpper(p.missing) AS u,
             p.missing + 1 AS plus
      """
    Then the result should be, in any order:
      | a    | u    | plus |
      | null | null | null |

  Scenario: DISTINCT on node variables dedups by identity
    Given an empty graph
    And having executed:
      """
      CREATE (a:A) CREATE (a)-[:R]->(:B) CREATE (a)-[:R]->(:B)
      """
    When executing query:
      """
      MATCH (a:A)-[:R]->(:B)
      WITH DISTINCT a
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: Expression alias reused in later arithmetic
    Given an empty graph
    When executing query:
      """
      WITH 6 AS x, 7 AS y
      WITH x * y AS prod
      RETURN prod, prod % 10 AS last_digit
      """
    Then the result should be, in any order:
      | prod | last_digit |
      | 42   | 2          |

  Scenario: Long chained arithmetic respects precedence
    Given an empty graph
    When executing query:
      """
      RETURN 2 + 3 * 4 AS a, (2 + 3) * 4 AS b, 2 * 3 ^ 2 AS c, -2 ^ 2 AS d
      """
    Then the result should be, in any order:
      | a  | b  | c    | d    |
      | 14 | 20 | 18.0 | -4.0 |

  Scenario: Unary minus on properties and literals
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 5})
      """
    When executing query:
      """
      MATCH (p:P) RETURN -p.v AS neg, -(-3) AS pos
      """
    Then the result should be, in any order:
      | neg | pos |
      | -5  | 3   |

  Scenario: WHERE with XOR
    Given an empty graph
    And having executed:
      """
      CREATE (:P {a: true, b: false}), (:P {a: true, b: true})
      """
    When executing query:
      """
      MATCH (p:P) WHERE p.a XOR p.b RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: IS NOT NULL filters missing properties
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P), (:P {v: 3})
      """
    When executing query:
      """
      MATCH (p:P) WHERE p.v IS NOT NULL RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: Entity functions of null are null
    Given an empty graph
    When executing query:
      """
      RETURN id(null) AS i, labels(null) AS l, type(null) AS t
      """
    Then the result should be, in any order:
      | i    | l    | t    |
      | null | null | null |
