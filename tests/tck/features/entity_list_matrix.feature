Feature: Entities inside lists — collect, literals, UNWIND, indexing, rendering

  # Entities in lists travel as id arrays internally; these scenarios pin
  # the user-visible semantics: property access rehydrates, RETURN renders
  # property maps (same row format as RETURN n), identity survives
  # round-trips, DISTINCT dedups by identity.

  Scenario: RETURN collect of nodes renders property maps
    Given an empty graph
    And having executed:
      """
      CREATE (:U {name: 'a', age: 1}), (:U {name: 'b', age: 2})
      """
    When executing query:
      """
      MATCH (u:U) WITH u ORDER BY u.name
      RETURN collect(u) AS us
      """
    Then the result should be, in any order:
      | us                                           |
      | [{name: 'a', age: 1}, {name: 'b', age: 2}]   |

  Scenario: RETURN a collected list bound through WITH
    Given an empty graph
    And having executed:
      """
      CREATE (:U {name: 'a'}), (:U {name: 'b'})
      """
    When executing query:
      """
      MATCH (u:U) WITH u ORDER BY u.name
      WITH collect(u) AS us
      RETURN us
      """
    Then the result should be, in any order:
      | us                           |
      | [{name: 'a'}, {name: 'b'}]   |

  Scenario: RETURN a literal list of bound entities
    Given an empty graph
    And having executed:
      """
      CREATE (a:U {name: 'a'})-[:R]->(b:U {name: 'b'})
      """
    When executing query:
      """
      MATCH (a:U {name: 'a'})-[:R]->(b:U)
      RETURN [a, b] AS pair
      """
    Then the result should be, in any order:
      | pair                         |
      | [{name: 'a'}, {name: 'b'}]   |

  Scenario: collect DISTINCT dedups by identity, not by properties
    Given an empty graph
    And having executed:
      """
      CREATE (:D {v: 1}), (:D {v: 1}), (:D {v: 2})
      """
    When executing query:
      """
      MATCH (d:D)
      RETURN size(collect(DISTINCT d)) AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |

  Scenario: RETURN collect DISTINCT keeps prop-identical nodes separate
    Given an empty graph
    And having executed:
      """
      CREATE (:D {v: 1}), (:D {v: 1})
      """
    When executing query:
      """
      MATCH (d:D)
      RETURN collect(DISTINCT d) AS ds
      """
    Then the result should be, in any order:
      | ds                   |
      | [{v: 1}, {v: 1}]     |

  Scenario: UNWIND a collected node list binds full entities
    Given an empty graph
    And having executed:
      """
      CREATE (:U {name: 'a', age: 1}), (:U {name: 'b', age: 2})
      """
    When executing query:
      """
      MATCH (u:U) WITH collect(u) AS us
      UNWIND us AS n
      RETURN n.name AS name, n.age AS age ORDER BY name
      """
    Then the result should be, in order:
      | name | age |
      | 'a'  | 1   |
      | 'b'  | 2   |

  Scenario: UNWIND a collected list then pattern-match from the element
    Given an empty graph
    And having executed:
      """
      CREATE (a:U {name: 'a'})-[:R]->(b:U {name: 'b'})
      """
    When executing query:
      """
      MATCH (u:U) WITH collect(u) AS us
      UNWIND us AS n
      MATCH (n)-[:R]->(m)
      RETURN n.name AS src, m.name AS dst
      """
    Then the result should be, in any order:
      | src | dst |
      | 'a' | 'b' |

  Scenario: labels() of an unwound collected node
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1}), (:B {k: 2})
      """
    When executing query:
      """
      MATCH (n) WITH collect(n) AS ns
      UNWIND ns AS x
      RETURN labels(x)[0] AS lbl ORDER BY lbl
      """
    Then the result should be, in order:
      | lbl |
      | 'A' |
      | 'B' |

  Scenario: indexing into a collected list then property access
    Given an empty graph
    And having executed:
      """
      CREATE (:U {name: 'a'}), (:U {name: 'b'})
      """
    When executing query:
      """
      MATCH (u:U) WITH u ORDER BY u.name
      WITH collect(u) AS us
      RETURN us[0].name AS first, us[-1].name AS last
      """
    Then the result should be, in any order:
      | first | last |
      | 'a'   | 'b'  |

  Scenario: slicing a collected list keeps it rehydratable
    Given an empty graph
    And having executed:
      """
      CREATE (:U {name: 'a'}), (:U {name: 'b'}), (:U {name: 'c'})
      """
    When executing query:
      """
      MATCH (u:U) WITH u ORDER BY u.name
      WITH collect(u) AS us
      RETURN [x IN us[1..] | x.name] AS tailnames
      """
    Then the result should be, in any order:
      | tailnames    |
      | ['b', 'c']   |

  Scenario: collected relationships rehydrate properties
    Given an empty graph
    And having executed:
      """
      CREATE (a:U {name: 'a'}), (b:U {name: 'b'}),
             (a)-[:R {w: 5}]->(b), (b)-[:R {w: 7}]->(a)
      """
    When executing query:
      """
      MATCH ()-[r:R]->() WITH r ORDER BY r.w
      WITH collect(r) AS rs
      RETURN [x IN rs | x.w] AS ws
      """
    Then the result should be, in any order:
      | ws       |
      | [5, 7]   |

  Scenario: UNWIND collected relationships binds full edges
    Given an empty graph
    And having executed:
      """
      CREATE (a:U {name: 'a'}), (b:U {name: 'b'}),
             (a)-[:R {w: 5}]->(b)
      """
    When executing query:
      """
      MATCH ()-[r:R]->() WITH collect(r) AS rs
      UNWIND rs AS e
      RETURN type(e) AS t, e.w AS w
      """
    Then the result should be, in any order:
      | t   | w |
      | 'R' | 5 |

  Scenario: comprehension over collected nodes with property filter
    Given an empty graph
    And having executed:
      """
      CREATE (:U {name: 'a', age: 1}), (:U {name: 'b', age: 9})
      """
    When executing query:
      """
      MATCH (u:U) WITH collect(u) AS us
      RETURN [x IN us WHERE x.age > 5 | x.name] AS old
      """
    Then the result should be, in any order:
      | old   |
      | ['b'] |

  Scenario: quantifiers over collected nodes with property predicates
    Given an empty graph
    And having executed:
      """
      CREATE (:U {age: 1}), (:U {age: 9})
      """
    When executing query:
      """
      MATCH (u:U) WITH collect(u) AS us
      RETURN ANY(x IN us WHERE x.age > 5) AS any_old,
             ALL(x IN us WHERE x.age > 0) AS all_pos,
             NONE(x IN us WHERE x.age > 100) AS none_huge,
             SINGLE(x IN us WHERE x.age = 9) AS one_nine
      """
    Then the result should be, in any order:
      | any_old | all_pos | none_huge | one_nine |
      | true    | true    | true      | true     |

  Scenario: size and membership on collected entity lists
    Given an empty graph
    And having executed:
      """
      CREATE (a:U {name: 'a'})-[:R]->(b:U {name: 'b'})
      """
    When executing query:
      """
      MATCH (a:U {name: 'a'})
      MATCH (u:U) WITH a, collect(u) AS us
      RETURN size(us) AS n, a IN us AS has_a
      """
    Then the result should be, in any order:
      | n | has_a |
      | 2 | true  |

  Scenario: empty collect yields an empty renderable list
    Given an empty graph
    And having executed:
      """
      CREATE (:U {name: 'a'})
      """
    When executing query:
      """
      MATCH (u:U) OPTIONAL MATCH (u)-[:R]->(m)
      WITH collect(m) AS ms
      RETURN ms, size(ms) AS n
      """
    Then the result should be, in any order:
      | ms | n |
      | [] | 0 |

  Scenario: collected list survives multiple WITH hops
    Given an empty graph
    And having executed:
      """
      CREATE (:U {name: 'a'}), (:U {name: 'b'})
      """
    When executing query:
      """
      MATCH (u:U) WITH u ORDER BY u.name
      WITH collect(u) AS us
      WITH us AS vs, size(us) AS n
      WITH vs, n WHERE n = 2
      RETURN [x IN vs | x.name] AS names
      """
    Then the result should be, in any order:
      | names      |
      | ['a', 'b'] |

  Scenario: reduce over a collected node list with property access
    Given an empty graph
    And having executed:
      """
      CREATE (:U {age: 3}), (:U {age: 4})
      """
    When executing query:
      """
      MATCH (u:U) WITH collect(u) AS us
      RETURN reduce(acc = 0, x IN us | acc + x.age) AS total
      """
    Then the result should be, in any order:
      | total |
      | 7     |

  Scenario: head and last style access via indexing into entity lists
    Given an empty graph
    And having executed:
      """
      CREATE (:U {name: 'a'}), (:U {name: 'z'})
      """
    When executing query:
      """
      MATCH (u:U) WITH u ORDER BY u.name DESC
      WITH collect(u) AS us
      RETURN us[0].name AS top
      """
    Then the result should be, in any order:
      | top |
      | 'z' |

  Scenario: concatenated entity lists stay rehydratable
    Given an empty graph
    And having executed:
      """
      CREATE (a:U {name: 'a'})-[:R]->(b:U {name: 'b'})
      """
    When executing query:
      """
      MATCH (a:U {name: 'a'}), (b:U {name: 'b'})
      WITH [a] AS xs, [b] AS ys
      RETURN [x IN xs | x.name] AS xn, [y IN ys | y.name] AS yn
      """
    Then the result should be, in any order:
      | xn    | yn    |
      | ['a'] | ['b'] |

  Scenario: UNWIND a literal entity list
    Given an empty graph
    And having executed:
      """
      CREATE (a:U {name: 'a'})-[:R]->(b:U {name: 'b'})
      """
    When executing query:
      """
      MATCH (a:U {name: 'a'})-[:R]->(b:U)
      UNWIND [a, b] AS n
      RETURN n.name AS name ORDER BY name
      """
    Then the result should be, in order:
      | name |
      | 'a'  |
      | 'b'  |

  Scenario: node identity equality inside collected lists
    Given an empty graph
    And having executed:
      """
      CREATE (:U {v: 1}), (:U {v: 1})
      """
    When executing query:
      """
      MATCH (a:U), (b:U) WHERE a.v = b.v
      WITH a, collect(b) AS bs
      RETURN size(bs) AS n, a IN bs AS self_in
      """
    Then the result should be, in any order:
      | n | self_in |
      | 2 | true    |
      | 2 | true    |
