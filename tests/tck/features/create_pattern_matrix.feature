Feature: CREATE pattern shapes matrix

  Scenario: create a chain in one pattern
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:B {k: 2})-[:S]->(:C {k: 3})
      """
    When executing query:
      """
      MATCH (a:A)-[:R]->(b:B)-[:S]->(c:C) RETURN a.k AS a, b.k AS b, c.k AS c
      """
    Then the result should be, in any order:
      | a | b | c |
      | 1 | 2 | 3 |

  Scenario: create multiple comma-separated patterns
    Given an empty graph
    And having executed:
      """
      CREATE (:X {k: 1}), (:X {k: 2}), (:Y {k: 3})
      """
    When executing query:
      """
      MATCH (n) RETURN count(n) AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |

  Scenario: create reuses a variable within the statement
    Given an empty graph
    And having executed:
      """
      CREATE (a:H {k: 1}), (a)-[:R]->(:L {k: 2}), (a)-[:R]->(:L {k: 3})
      """
    When executing query:
      """
      MATCH (h:H)-[:R]->(l:L) RETURN h.k AS h, count(l) AS n
      """
    Then the result should be, in any order:
      | h | n |
      | 1 | 2 |

  Scenario: create incoming-direction relationship
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})<-[:R]-(:B {k: 2})
      """
    When executing query:
      """
      MATCH (b:B)-[:R]->(a:A) RETURN b.k AS b, a.k AS a
      """
    Then the result should be, in any order:
      | b | a |
      | 2 | 1 |

  Scenario: create after match multiplies per row
    Given an empty graph
    And having executed:
      """
      CREATE (:U {k: 1}), (:U {k: 2})
      """
    And having executed:
      """
      MATCH (u:U) CREATE (u)-[:OWNS]->(:Item {of: u.k})
      """
    When executing query:
      """
      MATCH (:U)-[:OWNS]->(i:Item) RETURN i.of AS o ORDER BY o
      """
    Then the result should be, in order:
      | o |
      | 1 |
      | 2 |

  Scenario: created properties may be computed expressions
    Given an empty graph
    And having executed:
      """
      CREATE (:E {v: 2 * 3 + 1, s: 'a' + 'b'})
      """
    When executing query:
      """
      MATCH (e:E) RETURN e.v AS v, e.s AS s
      """
    Then the result should be, in any order:
      | v | s    |
      | 7 | 'ab' |

  Scenario: created null property reads back as null
    Given an empty graph
    And having executed:
      """
      CREATE (:E {a: 1, b: null})
      """
    When executing query:
      """
      MATCH (e:E) RETURN e.a AS a, e.b AS b
      """
    Then the result should be, in any order:
      | a | b    |
      | 1 | null |

  Scenario: create with list property round-trips
    Given an empty graph
    And having executed:
      """
      CREATE (:E {xs: [1, 2, 3]})
      """
    When executing query:
      """
      MATCH (e:E) RETURN e.xs AS xs, size(e.xs) AS n
      """
    Then the result should be, in any order:
      | xs        | n |
      | [1, 2, 3] | 3 |

  Scenario: create from parameters
    Given an empty graph
    And parameters are:
      | props | {name: 'p', v: 9} |
    When executing query:
      """
      CREATE (e:E {name: $props.name, v: $props.v}) RETURN e.name AS n, e.v AS v
      """
    Then the result should be, in any order:
      | n   | v |
      | 'p' | 9 |

  Scenario: create returning the created data
    Given an empty graph
    When executing query:
      """
      CREATE (a:A {k: 1})-[r:R {w: 2}]->(b:B {k: 3})
      RETURN a.k AS a, r.w AS w, b.k AS b
      """
    Then the result should be, in any order:
      | a | w | b |
      | 1 | 2 | 3 |

  Scenario: unwind create builds one node per element
    Given an empty graph
    And having executed:
      """
      UNWIND range(1, 4) AS i CREATE (:Batch {i: i})
      """
    When executing query:
      """
      MATCH (b:Batch) RETURN count(b) AS n, sum(b.i) AS s
      """
    Then the result should be, in any order:
      | n | s  |
      | 4 | 10 |

  Scenario: relationship between two matched nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:S {k: 1}), (:T {k: 2})
      """
    And having executed:
      """
      MATCH (s:S), (t:T) CREATE (s)-[:L {mark: s.k + t.k}]->(t)
      """
    When executing query:
      """
      MATCH (:S)-[l:L]->(:T) RETURN l.mark AS m
      """
    Then the result should be, in any order:
      | m |
      | 3 |
